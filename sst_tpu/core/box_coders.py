"""Box coders (JAX), matching the reference coders numerically.

  - delta_xyzwhlr: core/bbox/coders/delta_xyzwhlr_bbox_coder.py:20,57
    (SECOND-style anchor residuals; z is bottom-center in, center compared).
  - base_point:    core/bbox/coders/base_point_bbox_coder.py:8
    (FSD: offset from a base point / scale, log dims, sin/cos yaw).
"""

from __future__ import annotations

import jax.numpy as jnp


def delta_encode(anchors, gts):
    """[..., 7+] anchors/gts → regression targets."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xg, yg, zg, wg, lg, hg, rg = [gts[..., i] for i in range(7)]
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la**2 + wa**2)
    out = [
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / ha,
        jnp.log(wg / wa),
        jnp.log(lg / la),
        jnp.log(hg / ha),
        rg - ra,
    ]
    if gts.shape[-1] > 7:
        out.append(gts[..., 7:] - anchors[..., 7:])
        return jnp.concatenate(
            [jnp.stack(out[:-1], -1), out[-1]], axis=-1
        )
    return jnp.stack(out, -1)


def delta_decode(anchors, deltas):
    """Inverse of :func:`delta_encode` (reference decode :57-90)."""
    xa, ya, za, wa, la, ha, ra = [anchors[..., i] for i in range(7)]
    xt, yt, zt, wt, lt, ht, rt = [deltas[..., i] for i in range(7)]
    za = za + ha / 2
    diag = jnp.sqrt(la**2 + wa**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    wg = jnp.exp(wt) * wa
    lg = jnp.exp(lt) * la
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    out = jnp.stack([xg, yg, zg, wg, lg, hg, rg], -1)
    if deltas.shape[-1] > 7:
        out = jnp.concatenate([out, deltas[..., 7:] + anchors[..., 7:]], -1)
    return out


def base_point_encode(base_points, gts, scale: float):
    """FSD coder (base_point_bbox_coder.py): targets w.r.t. a per-cluster base
    point — Δcenter/scale, log(dim)/?, sin/cos yaw; velocity passthrough."""
    delta = (gts[..., :3] - base_points) / scale
    dims = jnp.log(gts[..., 3:6])
    yaw = gts[..., 6]
    enc = jnp.concatenate(
        [delta, dims, jnp.stack([jnp.sin(yaw), jnp.cos(yaw)], -1)], axis=-1
    )
    if gts.shape[-1] > 7:
        enc = jnp.concatenate([enc, gts[..., 7:]], -1)
    return enc


def base_point_decode(base_points, preds, scale: float):
    center = preds[..., :3] * scale + base_points
    dims = jnp.exp(preds[..., 3:6])
    yaw = jnp.arctan2(preds[..., 6], preds[..., 7])
    out = jnp.concatenate([center, dims, yaw[..., None]], -1)
    if preds.shape[-1] > 8:
        out = jnp.concatenate([out, preds[..., 8:]], -1)
    return out

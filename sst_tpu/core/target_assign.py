"""Max-IoU anchor↔gt assignment (mmdet MaxIoUAssigner semantics) with
anchor-chunked IoU computation to bound memory on large BEV anchor grids
(SST: 468*468*2 anchors/class — the reference computes the full [num_gt,
num_anchors] matrix on GPU, train_mixins.py:8-101; here we stream chunks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1
IGNORE = -2


@functools.partial(
    jax.jit, static_argnames=("iou_fn", "chunk", "pos_thr", "neg_thr", "min_pos_iou")
)
def max_iou_assign(
    anchors,
    gts,
    gt_valid,
    pos_thr: float,
    neg_thr: float,
    min_pos_iou: float,
    iou_fn,
    chunk: int = 32768,
):
    """Assign each anchor to a gt box.

    Args:
      anchors: [A, 7].
      gts: [G, 7+] padded gt boxes.
      gt_valid: [G] bool.
      iou_fn: pairwise fn (a_boxes, b_boxes) -> [n, G] IoU.

    Returns:
      assigned: [A] int32 — gt index, NEG (-1) or IGNORE (-2).
      max_iou: [A] per-anchor best IoU.
    """
    a = anchors.shape[0]
    g = gts.shape[0]
    pad = (-a) % chunk
    anchors_p = jnp.concatenate([anchors, jnp.zeros((pad, anchors.shape[1]), anchors.dtype)])
    chunks = anchors_p.reshape(-1, chunk, anchors.shape[1])

    def per_chunk(ch):
        iou = iou_fn(ch, gts[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        amax = iou.max(axis=1)
        aarg = iou.argmax(axis=1)
        gmax = iou.max(axis=0)  # per-gt best within this chunk
        return amax, aarg.astype(jnp.int32), gmax, iou

    # pass 1: per-anchor max/argmax and global per-gt max
    amax_l, aarg_l, gmax_l = [], [], []
    def scan_body(carry, ch):
        amax, aarg, gmax, _ = per_chunk(ch)
        return jnp.maximum(carry, gmax), (amax, aarg)

    gt_best, (amax_c, aarg_c) = jax.lax.scan(
        scan_body, jnp.full((g,), -1.0), chunks
    )
    max_iou = amax_c.reshape(-1)[:a]
    argmax_gt = aarg_c.reshape(-1)[:a]

    assigned = jnp.full((a,), IGNORE, jnp.int32)
    assigned = jnp.where(max_iou < neg_thr, NEG, assigned)
    assigned = jnp.where(max_iou >= pos_thr, argmax_gt, assigned)

    # pass 2: low-quality match — any anchor achieving a gt's best IoU gets
    # that gt (gt_max_assign_all=True mmdet default), if best >= min_pos_iou.
    def scan_body2(carry, xs):
        i, ch = xs
        _, _, _, iou = per_chunk(ch)
        hit = (iou == gt_best[None, :]) & (gt_best[None, :] >= min_pos_iou) & gt_valid[None, :]
        any_hit = hit.any(axis=1)
        which = hit.argmax(axis=1).astype(jnp.int32)
        return carry, (any_hit, which)

    _, (hit_c, which_c) = jax.lax.scan(
        scan_body2, None, (jnp.arange(chunks.shape[0]), chunks)
    )
    hit = hit_c.reshape(-1)[:a]
    which = which_c.reshape(-1)[:a]
    assigned = jnp.where(hit, which, assigned)
    return assigned, max_iou

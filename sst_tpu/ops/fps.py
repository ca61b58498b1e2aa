"""Furthest point sampling — global and per-group, static shapes.

TPU rebuild of the reference's CUDA ops:
  - furthest_point_sample (mmdet3d/ops/furthest_point_sample/) — used by
    SSGAssigner (single_stage_fsd.py:1002) and pointnet-family modules.
  - torchex group_fps (two_stage_fsdpp.py:29,671) — FPS *within each group*
    (seed box) so every kept object retains at most n_fps points.

Both are k rounds of distance-update + argmax. The grouped variant runs all
groups' rounds simultaneously: one segment-max + one gather per round, so the
cost is O(k · N) regardless of the number of groups — no per-group loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sst_tpu.ops.segment import segment_reduce

_BIG = 1e10


def furthest_point_sample(xyz, valid, k: int):
    """Iterative FPS over one point set.

    Args: xyz [N, 3]; valid [N] bool; k static sample count.
    Returns (idx [k] int32, ok [k] bool). Starts from the first valid point
    (reference kernel starts at index 0). Fewer than k valid points → the
    tail repeats the last pick with ok=False.
    """
    n = xyz.shape[0]
    first = jnp.argmax(valid).astype(jnp.int32)
    nvalid = valid.sum()

    def body(i, state):
        mindist, idx, ok = state
        cur = xyz[idx[i]]
        d = jnp.sum((xyz - cur[None]) ** 2, axis=-1)
        mindist = jnp.minimum(mindist, jnp.where(valid, d, -_BIG))
        nxt = jnp.argmax(mindist).astype(jnp.int32)
        idx = idx.at[i + 1].set(nxt)
        ok = ok.at[i + 1].set(i + 1 < nvalid)
        return mindist, idx, ok

    mindist = jnp.where(valid, _BIG, -_BIG)
    idx0 = jnp.full((k,), first, jnp.int32)
    ok0 = jnp.zeros((k,), bool).at[0].set(nvalid > 0)
    _, idx, ok = jax.lax.fori_loop(0, k - 1, body, (mindist, idx0, ok0))
    return idx, ok


def group_fps_mask(xyz, group_ids, valid, num_groups: int, k: int):
    """Keep-mask selecting up to k FPS points *per group*.

    Args: xyz [N, 3]; group_ids [N] int32 in [0, num_groups) (anything for
    invalid rows); valid [N]; k static per-group budget.
    Returns keep [N] bool. All groups advance one FPS round per iteration
    (segment-argmax via a max/compare pair), k rounds total.
    """
    n = xyz.shape[0]
    gid = jnp.where(valid, group_ids, num_groups)
    counts = segment_reduce(jnp.ones((n,), jnp.float32), gid, num_groups, "sum")
    iota = jnp.arange(n, dtype=jnp.int32)

    def pick(mindist, taken):
        """One FPS round for every group at once → per-point one-hot pick."""
        score = jnp.where(valid & ~taken, mindist, -_BIG)
        gmax = segment_reduce(score, gid, num_groups, "max")
        is_max = valid & ~taken & (score >= gmax[jnp.minimum(gid, num_groups - 1)]) & (score > -_BIG)
        # tie-break: lowest index per group
        cand = jnp.where(is_max, iota, n)
        gmin = segment_reduce(cand, gid, num_groups, "min").astype(jnp.int32)
        picked_idx = jnp.clip(gmin, 0, n - 1)  # [G]
        has = gmin < n
        return picked_idx, has

    def body(i, state):
        mindist, taken = state
        picked_idx, has = pick(mindist, taken)
        newly = jnp.zeros((n,), bool).at[
            jnp.where(has, picked_idx, n)
        ].set(True, mode="drop")
        taken = taken | newly
        # distance of every point to its group's newly picked point
        pick_xyz = xyz[picked_idx]  # [G, 3]
        own = pick_xyz[jnp.minimum(gid, num_groups - 1)]
        d = jnp.sum((xyz - own) ** 2, axis=-1)
        d = jnp.where(has[jnp.minimum(gid, num_groups - 1)], d, _BIG)
        mindist = jnp.minimum(mindist, d)
        return mindist, taken

    mindist0 = jnp.full((n,), _BIG)
    taken0 = jnp.zeros((n,), bool)
    _, taken = jax.lax.fori_loop(0, k, body, (mindist0, taken0))
    return taken & valid

"""Sort/segment sparse primitives — the TPU-native replacement for
``torch.unique(return_inverse=True)`` + ``torch_scatter`` + the reference's
CUDA ``ingroup_indices`` op.

Reference semantics being reproduced (see /root/reference):
  - ``scatter_v2``            mmdet3d/ops/sst/sst_ops.py:151  (unique + segment reduce)
  - ``get_inner_win_inds``    mmdet3d/ops/sst/sst_ops.py:244  (rank of element within its group)
  - ``make_continuous_inds``  mmdet3d/ops/sst/sst_ops.py:317  (compact group ids to 0..K-1)

Everything here is static-shape: callers pass a padded array of N slots with a
validity mask, plus a static segment capacity.  Invalid slots get segment id
== num_segments so that XLA's out-of-bounds scatter-drop semantics remove them
from every downstream reduction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

INT_SENTINEL = jnp.iinfo(jnp.int32).max


class UniqueResult(NamedTuple):
    """Static-shape equivalent of torch.unique(keys, return_inverse, return_counts).

    Attributes:
      seg_ids: [N] int32. Dense segment id in [0, num_segments) for each valid
        input slot; == num_segments for invalid slots or overflow beyond the
        static capacity (such ids are dropped by scatter ops under jit).
      ranks: [N] int32. Rank of the element within its segment, in sorted-key
        order (the reference's ``get_inner_win_inds``). Arbitrary-but-valid
        for invalid slots.
      unique_keys: [num_segments] int32. The distinct keys (INT_SENTINEL for
        unused capacity).
      counts: [num_segments] int32. Number of valid elements per segment.
      num_unique: [] int32. Number of distinct valid keys (may exceed
        num_segments if capacity overflowed; callers can check).
      valid: [N] bool. Input validity, passed through.
      order: [N] int32 sort permutation (rows taken in this order are grouped
        by segment, ids nondecreasing — what ops.sorted_reduce consumes), or
        None when the producer never sorted (unique_segments_canvas).
    """

    seg_ids: jax.Array
    ranks: jax.Array
    unique_keys: jax.Array
    counts: jax.Array
    num_unique: jax.Array
    valid: jax.Array
    order: jax.Array | None = None


@functools.partial(jax.jit, static_argnames=("num_segments",))
def unique_segments(keys: jax.Array, valid: jax.Array, num_segments: int) -> UniqueResult:
    """Compute dense segment ids for integer keys via one stable sort.

    Args:
      keys: [N] int32 group keys (need not be contiguous or bounded).
      valid: [N] bool mask of real (non-padding) slots.
      num_segments: static capacity for the number of distinct keys.
    """
    n = keys.shape[0]
    k = jnp.where(valid, keys, INT_SENTINEL).astype(jnp.int32)
    order = jnp.argsort(k, stable=True)
    ks = k[order]
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
    seg_sorted = jnp.cumsum(head.astype(jnp.int32)) - 1  # 0-based dense id in sorted order
    idx = jnp.arange(n, dtype=jnp.int32)
    # start position of each run = cummax over (head ? i : 0)
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(head, idx, 0))
    rank_sorted = idx - start
    valid_sorted = ks != INT_SENTINEL
    num_unique = jnp.sum((head & valid_sorted).astype(jnp.int32))
    # invalid → num_segments (dropped by OOB scatters); overflow beyond the
    # static capacity also maps past the end.
    seg_sorted = jnp.where(valid_sorted, seg_sorted, num_segments)
    seg_sorted = jnp.minimum(seg_sorted, num_segments)

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(idx)
    seg_ids = seg_sorted[inv_order]
    ranks = rank_sorted[inv_order]

    unique_keys = (
        jnp.full((num_segments,), INT_SENTINEL, jnp.int32).at[seg_sorted].set(ks, mode="drop")
    )
    counts = jax.ops.segment_sum(
        valid_sorted.astype(jnp.int32), seg_sorted, num_segments=num_segments
    )
    return UniqueResult(seg_ids, ranks, unique_keys, counts, num_unique, valid,
                        order.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_segments", "key_space"))
def unique_segments_canvas(keys: jax.Array, valid: jax.Array,
                           num_segments: int, key_space: int) -> UniqueResult:
    """Sort-free unique for BOUNDED key spaces: occupancy canvas + cumsum.

    Produces the same dense seg ids (ascending key order) and overflow
    semantics as :func:`unique_segments` WITHOUT the O(N log N) sort — one
    scatter + one prefix sum over the key space + one gather, profiled 3-5x
    faster than the sort at N~200k, key_space~12M (the segmentor voxel
    grid). Memory is O(key_space), so callers gate on grid size.

    LIMITATION: per-segment ``ranks`` are NOT computed (all zeros) — valid
    only for consumers that never read them (dynamic-VFE scatter paths; the
    hard-voxelize slot assignment must keep the sort).
    """
    n = keys.shape[0]
    k = jnp.where(valid, keys, key_space).astype(jnp.int32)
    occ = jnp.zeros((key_space + 1,), jnp.bool_).at[k].set(
        True, mode="drop")[:key_space]
    rank = jnp.cumsum(occ.astype(jnp.int32)) - 1  # dense id per occupied cell
    cell_seg = jnp.where(occ, jnp.minimum(rank, num_segments), num_segments)
    seg_ids = jnp.where(
        valid, cell_seg[jnp.minimum(k, key_space - 1)], num_segments)
    num_unique = occ.sum().astype(jnp.int32)
    unique_keys = (
        jnp.full((num_segments,), INT_SENTINEL, jnp.int32)
        .at[seg_ids].set(k, mode="drop")
    )
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), seg_ids, num_segments=num_segments + 1
    )[:num_segments]
    ranks = jnp.zeros((n,), jnp.int32)  # see LIMITATION above
    return UniqueResult(seg_ids, ranks, unique_keys, counts, num_unique, valid)


def segment_reduce(
    data: jax.Array,
    seg_ids: jax.Array,
    num_segments: int,
    mode: str = "mean",
) -> jax.Array:
    """Segment reduction with OOB-drop padding semantics (scatter_v2 analog).

    Args:
      data: [N, C] (or [N]) values; rows whose seg_id >= num_segments are dropped.
      seg_ids: [N] int32.
      num_segments: static output rows.
      mode: 'sum' | 'mean' | 'max' | 'min'.

    Returns [num_segments, C]. Empty segments are 0 (sum/mean) or 0 (max/min —
    matching torch_scatter's zero-init convention used by the reference).
    """
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    if mode == "sum":
        out = jax.ops.segment_sum(data, seg_ids, num_segments=num_segments)
    elif mode == "mean":
        s = jax.ops.segment_sum(data, seg_ids, num_segments=num_segments)
        cnt = jax.ops.segment_sum(
            jnp.ones((data.shape[0],), data.dtype), seg_ids, num_segments=num_segments
        )
        out = s / jnp.maximum(cnt, 1.0)[:, None]
    elif mode == "max":
        out = jax.ops.segment_max(data, seg_ids, num_segments=num_segments)
        # segment_max initializes with -inf; zero out empty segments like
        # torch_scatter.scatter_max does.
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif mode == "min":
        out = jax.ops.segment_min(data, seg_ids, num_segments=num_segments)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    else:
        raise NotImplementedError(mode)
    if squeeze:
        out = out[:, 0]
    return out


def segment_max_with_argmax(
    data: jax.Array, seg_ids: jax.Array, num_segments: int
) -> tuple[jax.Array, jax.Array]:
    """Per-segment max over rows and the argmax row index (for max-pool backprop
    parity with torch_scatter.scatter_max)."""
    out = jax.ops.segment_max(data, seg_ids, num_segments=num_segments)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    is_max = data == out[jnp.minimum(seg_ids, num_segments - 1)]
    n = data.shape[0]
    row = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], data.shape)
    row = jnp.where(is_max, row, n)
    argmax = jax.ops.segment_min(row, seg_ids, num_segments=num_segments)
    return out, argmax


def scatter_v2(
    feat: jax.Array,
    keys: jax.Array,
    valid: jax.Array,
    num_segments: int,
    mode: str = "mean",
    unique: UniqueResult | None = None,
) -> tuple[jax.Array, UniqueResult]:
    """unique + segment-reduce, the reference's most-used primitive
    (mmdet3d/ops/sst/sst_ops.py:151).

    Returns (voxel_feats [num_segments, C], UniqueResult). Pass a precomputed
    ``unique`` to reuse the sort (the reference's ``unique_once`` optimization,
    voxel_encoder.py:559-563).
    """
    if unique is None:
        unique = unique_segments(keys, valid, num_segments)
    out = segment_reduce(feat, unique.seg_ids, num_segments, mode=mode)
    return out, unique


def gather_segments(voxel_data: jax.Array, seg_ids: jax.Array, fill: float = 0.0) -> jax.Array:
    """Broadcast per-segment data back to elements (voxel→point mapping,
    the reference's ``map_voxel_center_to_point`` voxel_encoder.py:183 without
    the dense canvas). Rows with seg_id >= num_segments get ``fill``."""
    num_segments = voxel_data.shape[0]
    safe = jnp.minimum(seg_ids, num_segments - 1)
    out = voxel_data[safe]
    oob = (seg_ids >= num_segments)[(...,) + (None,) * (voxel_data.ndim - 1)]
    return jnp.where(oob, fill, out)

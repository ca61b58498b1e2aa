"""Regional window grouping + drop-level region batching, static-shape.

TPU-native rebuild of the reference's SST window machinery:
  - ``get_window_coors``       mmdet3d/ops/sst/sst_ops.py:267
  - drop-level bucketing       mmdet3d/models/middle_encoders/sst_input_layer_v2.py:131-227
  - ``get_flat2win_inds(_v2)`` mmdet3d/ops/sst/sst_ops.py:27,134
  - ``flat2window/window2flat`` sst_ops.py:67,106

The reference buckets windows by token count into a few padded dense shapes
(already a static-shape idea); here every bucket additionally has a static
window-count cap so the whole pipeline is fixed-shape for XLA. Voxels in
windows beyond a bucket's window cap are dropped (masked), mirroring the
reference's tail-drop beyond the largest bucket.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from sst_tpu.ops.segment import unique_segments

OOB = jnp.iinfo(jnp.int32).max


@struct.dataclass
class BucketSpec:
    """One region-batching level (reference drop_info entry + static caps)."""

    max_tokens: int = struct.field(pytree_node=False)
    drop_lower: int = struct.field(pytree_node=False)
    drop_upper: int = struct.field(pytree_node=False)
    max_windows: int = struct.field(pytree_node=False)


@struct.dataclass
class FlatToWindow:
    """Scatter/gather plan between flat voxels [N, C] and one shift's bucketed
    dense window tensors ([max_windows_b, max_tokens_b, C] per bucket)."""

    drop_lvl: jax.Array  # [N] int32, bucket index or -1
    flat_inds: jax.Array  # [N] int32, win_in_bucket * max_tokens + rank (own bucket)
    valid: jax.Array  # [N] bool — voxel survives in this shift
    coors_in_win: jax.Array  # [N, 3] int32 (z, y, x) within window
    buckets: tuple = struct.field(pytree_node=False)  # tuple[BucketSpec]
    # per-bucket [max_windows, max_tokens] True-=-masked key padding, computed
    # once at plan build (window_key_padding falls back to a scatter when
    # empty, for plans built by the legacy build_flat2win path)
    pads: tuple = ()
    # per-bucket [max_windows * max_tokens] int32 slot -> flat-row index
    # (N for empty slots). Lets flat2window run as a row GATHER instead of a
    # scatter — profiled 2-4x faster on TPU (no zero-init, no random writes);
    # built once per plan, reused by every attention layer.
    inv_inds: tuple = ()


def get_window_coors(
    coords: jax.Array,
    sparse_shape: Sequence[int],
    window_shape: Sequence[int],
    do_shift: bool,
    valid: jax.Array,
):
    """Map voxel coords (b,z,y,x) → batch-unique window index + intra-window coord.

    Mirrors sst_ops.py:267 semantics: sparse_shape is (x, y, z); window_shape
    is (wx, wy) for pillar windows or (wx, wy, wz).
    """
    if len(window_shape) == 2:
        wx, wy = window_shape
        wz = sparse_shape[2]
    else:
        wx, wy, wz = window_shape
    sx, sy, sz = sparse_shape

    mx = -(-sx // wx) + 1  # ceil + 1, room for the shifted pass
    my = -(-sy // wy) + 1
    mz = -(-sz // wz) + 1
    n_win_per_sample = mx * my * mz

    if do_shift:
        shift_x, shift_y, shift_z = wx // 2, wy // 2, wz // 2
    else:
        shift_x, shift_y, shift_z = wx, wy, wz
    if sz == wz:  # 2D windows: never shift along z
        shift_z = 0

    x = coords[:, 3] + shift_x
    y = coords[:, 2] + shift_y
    z = coords[:, 1] + shift_z

    win_x, win_y, win_z = x // wx, y // wy, z // wz
    batch_win_inds = (
        coords[:, 0] * n_win_per_sample + (win_x * my + win_y) * mz + win_z
    )
    batch_win_inds = jnp.where(valid, batch_win_inds, -1).astype(jnp.int32)
    coors_in_win = jnp.stack([z % wz, y % wy, x % wx], axis=-1).astype(jnp.int32)
    return batch_win_inds, coors_in_win


def assign_drop_levels(counts_per_voxel: jax.Array, buckets: Sequence[BucketSpec]):
    """Token-count → bucket index (-1 if above every bucket's drop range),
    mirroring drop_single_shift (sst_input_layer_v2.py:131-155)."""
    lvl = jnp.full_like(counts_per_voxel, -1)
    target = jnp.zeros_like(counts_per_voxel)
    for i, b in enumerate(buckets):
        m = (counts_per_voxel >= b.drop_lower) & (counts_per_voxel < b.drop_upper)
        lvl = jnp.where(m, i, lvl)
        target = jnp.where(m, b.max_tokens, target)
    return lvl, target


def drop_and_bucket(
    win_inds: jax.Array,
    valid: jax.Array,
    buckets: Sequence[BucketSpec],
    max_total_windows: int,
):
    """One shift's drop pass: per-window token counts → drop level per voxel →
    keep mask (rank < bucket.max_tokens). Returns (keep, drop_lvl)."""
    _, keep, lvl = drop_pass(win_inds, valid, buckets, max_total_windows)
    return keep, lvl


def drop_pass(
    win_inds: jax.Array,
    valid: jax.Array,
    buckets: Sequence[BucketSpec],
    max_total_windows: int,
):
    """One shift's drop pass, returning its sort for reuse.

    Same semantics as :func:`drop_and_bucket` but also returns the
    UniqueResult so :func:`finalize_flat2win` can build the scatter plan
    WITHOUT re-sorting per bucket — profiled at 65k voxels, the per-bucket
    unique_segments calls in build_flat2win were ~20 ms/frame of pure
    re-sorting of the same keys.
    """
    uniq = unique_segments(win_inds, valid, max_total_windows)
    counts_per_voxel = uniq.counts[jnp.minimum(uniq.seg_ids, max_total_windows - 1)]
    counts_per_voxel = jnp.where(valid, counts_per_voxel, 0)
    lvl, target = assign_drop_levels(counts_per_voxel, buckets)
    keep = valid & (lvl >= 0) & (uniq.ranks < target) & (uniq.seg_ids < max_total_windows)
    return uniq, keep, lvl


def finalize_flat2win(
    uniq,
    coors_in_win: jax.Array,
    drop_lvl: jax.Array,
    valid: jax.Array,
    buckets: Sequence[BucketSpec],
    max_total_windows: int,
) -> FlatToWindow:
    """Scatter plan from a drop_pass sort — no further sorting.

    Windows are numbered within their bucket by ascending window key via a
    cumsum over the [max_total_windows] window table (the same order the
    per-bucket unique_segments of :func:`build_flat2win` produces). `valid`
    may be a subset of the drop-pass mask (the other shift's drops): ranks
    then have holes, which just leave padded slots — every surviving voxel's
    rank is already < its bucket's max_tokens.
    """
    n = uniq.seg_ids.shape[0]
    # window-level bucket assignment from per-window token counts
    wused = uniq.counts > 0
    wlvl, _ = assign_drop_levels(uniq.counts, buckets)
    wlvl = jnp.where(wused, wlvl, -1)
    seg = jnp.minimum(uniq.seg_ids, max_total_windows - 1)
    # only windows with a SURVIVING voxel occupy a slot: a window fully
    # emptied by the other shift's drops must not consume max_windows
    # capacity (the per-bucket unique of build_flat2win never saw such
    # windows; counting them here pushed real windows past the cap)
    wsurv = jnp.zeros((max_total_windows,), jnp.bool_).at[
        jnp.where(valid, uniq.seg_ids, max_total_windows)
    ].set(True, mode="drop")
    flat_inds = jnp.full((n,), OOB, jnp.int32)
    out_valid = jnp.zeros((n,), jnp.bool_)
    for i, b in enumerate(buckets):
        wmask = (wlvl == i) & wsurv
        cw = jnp.cumsum(wmask.astype(jnp.int32)) - 1  # compact id in bucket
        wok = wmask & (cw < b.max_windows)
        ok = (
            valid & (drop_lvl == i) & (uniq.seg_ids < max_total_windows)
            & wok[seg] & (uniq.ranks < b.max_tokens)
        )
        flat_inds = jnp.where(ok, cw[seg] * b.max_tokens + uniq.ranks, flat_inds)
        out_valid = out_valid | ok
    f2w = FlatToWindow(
        drop_lvl=jnp.where(out_valid, drop_lvl, -1),
        flat_inds=flat_inds,
        valid=out_valid,
        coors_in_win=coors_in_win,
        buckets=tuple(buckets),
    )
    return f2w.replace(pads=tuple(window_key_padding(f2w)),
                       inv_inds=tuple(invert_flat_inds(f2w)))


def build_flat2win(
    win_inds: jax.Array,
    coors_in_win: jax.Array,
    drop_lvl: jax.Array,
    valid: jax.Array,
    buckets: Sequence[BucketSpec],
) -> FlatToWindow:
    """Final scatter plan: per bucket, compact window ids to 0..max_windows-1
    and slot voxels by rank (get_flat2win_inds, sst_ops.py:27-65)."""
    n = win_inds.shape[0]
    flat_inds = jnp.full((n,), OOB, jnp.int32)
    out_valid = jnp.zeros((n,), jnp.bool_)
    for i, b in enumerate(buckets):
        in_b = valid & (drop_lvl == i)
        uniq = unique_segments(win_inds, in_b, b.max_windows)
        ok = in_b & (uniq.seg_ids < b.max_windows) & (uniq.ranks < b.max_tokens)
        inds = uniq.seg_ids * b.max_tokens + uniq.ranks
        flat_inds = jnp.where(ok, inds, flat_inds)
        out_valid = out_valid | ok
    return FlatToWindow(
        drop_lvl=jnp.where(out_valid, drop_lvl, -1),
        flat_inds=flat_inds,
        valid=out_valid,
        coors_in_win=coors_in_win,
        buckets=tuple(buckets),
    )


def invert_flat_inds(f2w: FlatToWindow):
    """Per-bucket slot→row tables (one s32 scatter each, done once per plan)."""
    n = f2w.flat_inds.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    out = []
    for i, b in enumerate(f2w.buckets):
        size = b.max_windows * b.max_tokens
        idx = jnp.where(f2w.valid & (f2w.drop_lvl == i), f2w.flat_inds, size)
        inv = jnp.full((size,), n, jnp.int32).at[idx].set(rows, mode="drop")
        out.append(inv)
    return out


def flat2window(feat: jax.Array, f2w: FlatToWindow, padding: float = 0.0):
    """[N, C] voxel features → per-bucket dense window tensors.

    Returns list of [max_windows_b, max_tokens_b, C] arrays (one per bucket).
    Uses the plan's precomputed inverse tables as a row gather when present;
    falls back to a scatter for legacy plans.
    """
    c = feat.shape[-1]
    out = []
    if f2w.inv_inds:
        ext = jnp.concatenate(
            [feat, jnp.full((1, c), padding, feat.dtype)], axis=0)
        for b, inv in zip(f2w.buckets, f2w.inv_inds):
            out.append(ext[inv].reshape(b.max_windows, b.max_tokens, c))
        return out
    for i, b in enumerate(f2w.buckets):
        size = b.max_windows * b.max_tokens
        idx = jnp.where(f2w.valid & (f2w.drop_lvl == i), f2w.flat_inds, size)
        dense = jnp.full((size, c), padding, feat.dtype).at[idx].set(feat, mode="drop")
        out.append(dense.reshape(b.max_windows, b.max_tokens, c))
    return out

def window2flat(feat_3d_list, f2w: FlatToWindow) -> jax.Array:
    """Gather per-bucket dense window tensors back to flat [N, C]
    (window2flat, sst_ops.py:106). Dropped voxels get zeros."""
    n = f2w.flat_inds.shape[0]
    c = feat_3d_list[0].shape[-1]
    out = jnp.zeros((n, c), feat_3d_list[0].dtype)
    for i, b in enumerate(f2w.buckets):
        flat = feat_3d_list[i].reshape(-1, c)
        in_b = f2w.valid & (f2w.drop_lvl == i)
        idx = jnp.where(in_b, f2w.flat_inds, 0)
        out = jnp.where(in_b[:, None], flat[jnp.minimum(idx, flat.shape[0] - 1)], out)
    return out


def window_key_padding(f2w: FlatToWindow):
    """True = masked (empty slot), per bucket [max_windows_b, max_tokens_b]
    (get_key_padding_mask, sst_input_layer_v2.py:308). Uses the plan's
    precomputed masks when present (one scatter at plan build instead of one
    per attention layer)."""
    if f2w.pads:
        return list(f2w.pads)
    ones = jnp.ones((f2w.flat_inds.shape[0], 1), jnp.float32)
    dense = flat2window(ones, f2w, padding=0.0)
    return [d[..., 0] < 0.5 for d in dense]

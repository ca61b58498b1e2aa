"""SST input layer: window partition both shifts, drop-level region batching,
flat→window plans, sinusoidal in-window position embedding.

TPU rebuild of SSTInputLayerV2
(/root/reference/mmdet3d/models/middle_encoders/sst_input_layer_v2.py:41).
Parameter-free: a pure function producing a static-shape :class:`SSTPlan`.
Voxel order is optionally shuffled (train) so rank-based drops are uniform,
mirroring shuffle_voxels (:95-99).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from sst_tpu.ops.window import (
    BucketSpec,
    FlatToWindow,
    assign_drop_levels,
    drop_pass,
    finalize_flat2win,
    get_window_coors,
)


@struct.dataclass
class SSTPlan:
    """Everything SSTv2 needs: per-shift scatter plans + pos embeds + the final
    surviving-voxel mask."""

    f2w: tuple  # (FlatToWindow, FlatToWindow)
    pos: tuple  # per-shift [N, d_model] float32 position embeddings
    valid: jax.Array  # [N] voxels surviving both drop passes
    # voxels removed by the REFERENCE drop semantics themselves — in-window
    # rank beyond the bucket's seat count (drop_info max_tokens,
    # sst_input_layer_v2.py:131-155) or token count outside every bucket's
    # range. Intentional SST behavior, NOT a capacity overflow; the
    # remainder of (~valid & voxel_valid) is static-cap overflow.
    num_seat_trimmed: jax.Array  # scalar int32


def sinusoidal_window_pos(coors_in_win, window_shape, d_model: int,
                          pos_temperature: float = 10000.0, normalize: bool = False):
    """Intra-window sine/cosine embedding (sst_input_layer_v2.py:239-306)."""
    if len(window_shape) == 2 or window_shape[-1] == 1:
        ndim = 2
        win_x, win_y = window_shape[0], window_shape[1]
        win_z = 0
    else:
        win_x, win_y, win_z = window_shape
        ndim = 3
    z = coors_in_win[:, 0].astype(jnp.float32) - win_z / 2
    y = coors_in_win[:, 1].astype(jnp.float32) - win_y / 2
    x = coors_in_win[:, 2].astype(jnp.float32) - win_x / 2
    if normalize:
        x = x / win_x * 2 * np.pi
        y = y / win_y * 2 * np.pi
        if ndim == 3:
            z = z / win_z * 2 * np.pi

    pos_length = d_model // ndim
    inv_freq = jnp.arange(pos_length, dtype=jnp.float32)
    inv_freq = pos_temperature ** (2 * (inv_freq // 2) / pos_length)

    def embed(v):
        e = v[:, None] / inv_freq[None, :]
        return jnp.stack([jnp.sin(e[:, ::2]), jnp.cos(e[:, 1::2])], axis=-1).reshape(
            v.shape[0], -1
        )

    parts = [embed(x), embed(y)] + ([embed(z)] if ndim == 3 else [])
    pe = jnp.concatenate(parts, axis=-1)
    gap = d_model - pe.shape[1]
    if gap > 0:
        pe = jnp.concatenate([pe, jnp.zeros((pe.shape[0], gap), pe.dtype)], axis=1)
    return pe


def sst_input_layer(
    voxel_coords,
    voxel_valid,
    sparse_shape,  # (x, y, z)
    window_shape,  # (wx, wy) or (wx, wy, wz)
    buckets,  # tuple[BucketSpec]
    d_model: int,
    max_total_windows: int,
    pos_temperature: float = 10000.0,
    normalize_pos: bool = False,
    shuffle_rng: jax.Array | None = None,
) -> SSTPlan:
    """Build the two-shift window plan for a batch of voxels.

    Note on shuffling: the reference permutes voxel rows; here we instead add a
    random per-voxel tiebreak by permuting which rows sort first — ranks come
    from a stable sort over window ids, so shuffling row order is equivalent.
    We express it as a random permutation applied to the *rank source* by
    shuffling coords fed to drop_and_bucket via a permutation and mapping back.
    """
    n = voxel_coords.shape[0]
    if shuffle_rng is not None:
        perm = jax.random.permutation(shuffle_rng, n)
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        coords_s = voxel_coords[perm]
        valid_s = voxel_valid[perm]
    else:
        perm = inv = None
        coords_s = voxel_coords
        valid_s = voxel_valid

    win0, ciw0 = get_window_coors(coords_s, sparse_shape, window_shape, False, valid_s)
    win1, ciw1 = get_window_coors(coords_s, sparse_shape, window_shape, True, valid_s)

    # one sort per shift: the drop pass's sort is reused for the scatter plan
    uniq0, keep0, lvl0 = drop_pass(win0, valid_s, buckets, max_total_windows)
    uniq1, keep1, lvl1 = drop_pass(win1, keep0, buckets, max_total_windows)
    final = keep0 & keep1

    def design_dropped(uniq, valid, lvl):
        # by-design drop set of this shift (see SSTPlan.num_seat_trimmed):
        # reuses the drop pass's sort, elementwise only
        counts = uniq.counts[jnp.minimum(uniq.seg_ids, max_total_windows - 1)]
        _, target = assign_drop_levels(jnp.where(valid, counts, 0), buckets)
        in_table = uniq.seg_ids < max_total_windows
        return valid & in_table & ((lvl < 0) | (uniq.ranks >= target))

    # shift-1 design drops are evaluated on shift-0 survivors, so the two
    # sets are disjoint and their sizes add
    num_seat_trimmed = (
        design_dropped(uniq0, valid_s, lvl0).sum()
        + design_dropped(uniq1, keep0, lvl1).sum()
    ).astype(jnp.int32)

    f2w0 = finalize_flat2win(uniq0, ciw0, lvl0, final, buckets, max_total_windows)
    f2w1 = finalize_flat2win(uniq1, ciw1, lvl1, final, buckets, max_total_windows)

    pos0 = sinusoidal_window_pos(ciw0, window_shape, d_model, pos_temperature, normalize_pos)
    pos1 = sinusoidal_window_pos(ciw1, window_shape, d_model, pos_temperature, normalize_pos)

    if perm is not None:
        # map plan back to original voxel order (window-space fields — pads —
        # are row-order independent; inv_inds hold shuffled row ids, so remap
        # them through perm: shuffled row i is original row perm[i])
        perm32 = perm.astype(jnp.int32)

        def unshuffle_f2w(f: FlatToWindow) -> FlatToWindow:
            return f.replace(
                drop_lvl=f.drop_lvl[inv],
                flat_inds=f.flat_inds[inv],
                valid=f.valid[inv],
                coors_in_win=f.coors_in_win[inv],
                inv_inds=tuple(
                    jnp.where(iv < n, perm32[jnp.minimum(iv, n - 1)], n)
                    for iv in f.inv_inds
                ),
            )

        f2w0, f2w1 = unshuffle_f2w(f2w0), unshuffle_f2w(f2w1)
        pos0, pos1 = pos0[inv], pos1[inv]

    # A voxel can additionally be lost to a bucket's static window-capacity
    # overflow in either shift; the usable set is the intersection. (With
    # properly-sized caps this matches the reference's drop set exactly.)
    return SSTPlan(f2w=(f2w0, f2w1), pos=(pos0, pos1),
                   valid=f2w0.valid & f2w1.valid,
                   num_seat_trimmed=num_seat_trimmed)

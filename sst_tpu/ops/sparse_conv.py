"""Submanifold / strided / inverse 3D sparse convolution for TPU.

TPU-native replacement for spconv (the reference's production backend —
/root/reference/mmdet3d/ops/spconv/, SURVEY §2.1 `sparse_conv_ext` row):
instead of CUDA rulebook+gather-GEMM-scatter with atomics, we use

  * a dense int32 *index canvas* per resolution level for O(1) neighbor
    lookup (scatter once, gather 27x) — regular memory access, no atomics;
  * per-offset gather + batched matmul (einsum over the 27 kernel taps) —
    all FLOPs land on the MXU;
  * static voxel caps per level; padding rows carry index V (gathers a zero
    row).

Levels are keyed like spconv's ``indice_key``: all submanifold convs at one
resolution share a neighbor table; a strided conv caches its input level so
the paired SparseInverseConv can map back by arithmetic (no stored rulebook
needed — the inverse neighbor table is recomputed from coords).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sst_tpu.ops.segment import unique_segments


@struct.dataclass
class SparseGrid:
    """Active sites of one resolution level (sorted-key invariant)."""

    keys: jax.Array  # [V] int32 linearized (b,z,y,x), ascending, INT_MAX pad
    coords: jax.Array  # [V, 4] int32 (b, z, y, x); -1 pad
    valid: jax.Array  # [V] bool
    grid: tuple = struct.field(pytree_node=False)  # (nz, ny, nx)
    batch_size: int = struct.field(pytree_node=False)

    @property
    def cap(self) -> int:
        return self.keys.shape[0]


def make_sparse_grid(coords, valid, grid, batch_size, cap=None) -> SparseGrid:
    """Build a sorted SparseGrid from (possibly unsorted) coords."""
    nz, ny, nx = grid
    keys = ((coords[:, 0] * nz + coords[:, 1]) * ny + coords[:, 2]) * nx + coords[:, 3]
    keys = jnp.where(valid, keys, jnp.iinfo(jnp.int32).max).astype(jnp.int32)
    order = jnp.argsort(keys, stable=True)
    keys = keys[order]
    coords = coords[order]
    valid = valid[order]
    sg = SparseGrid(keys=keys, coords=coords, valid=valid, grid=grid,
                    batch_size=batch_size)
    return sg, order


def build_canvas(sg: SparseGrid) -> jax.Array:
    """Column canvas [B*ny*nx + 1, nz+2] int32 mapping (xy-cell, z+1) → site
    index (cap for empty slots).

    Layout rationale (TPU): neighbor lookup via a flat [B*nz*ny*nx] canvas
    needs 27 scalar gathers per site — measured ~25 ms per table at 131k
    voxels. Grouping z into rows turns that into 9 *row* gathers (the fast
    embedding-lookup path) + a vectorized one-hot z-select. The ±1 ghost z
    slots and the trailing all-cap row keep every lookup in bounds, so no
    per-tap scatter/where on addresses is needed.
    """
    nz, ny, nx = sg.grid
    nzp = nz + 2
    ncells = sg.batch_size * ny * nx
    c = sg.coords
    pos = ((c[:, 0] * ny + c[:, 2]) * nx + c[:, 3]) * nzp + c[:, 1] + 1
    pos = jnp.where(sg.valid, pos, ncells * nzp)
    flat = jnp.full(((ncells + 1) * nzp,), sg.cap, jnp.int32)
    flat = flat.at[pos].set(jnp.arange(sg.cap, dtype=jnp.int32), mode="drop")
    return flat.reshape(ncells + 1, nzp)


def _kernel_offsets(kernel_size: int = 3):
    r = kernel_size // 2
    offs = [
        (dz, dy, dx)
        for dz in range(-r, r + 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]
    return np.asarray(offs, np.int32)  # [K^3, 3]


def _zselect(cols: jax.Array, z_target: jax.Array) -> jax.Array:
    """cols [V, nzp] site ids; z_target [V] (ghost-shifted, clipped). Returns
    cols[v, z_target[v]] as a one-hot multiply-reduce (no minor-axis gather)."""
    nzp = cols.shape[-1]
    iota = jnp.arange(nzp, dtype=jnp.int32)
    onehot = iota[None, :] == z_target[:, None]
    return jnp.where(onehot, cols, 0).sum(axis=-1)


def subm_neighbor_table(sg: SparseGrid, canvas: jax.Array, kernel_size: int = 3):
    """[K^3, V] int32 neighbor site indices (cap = missing)."""
    assert kernel_size == 3, "3x3x3 only (spconv parity)"
    nz, ny, nx = sg.grid
    nzp = nz + 2
    ncells = sg.batch_size * ny * nx
    b, z, y, x = (sg.coords[:, i] for i in range(4))
    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy, xx = y + dy, x + dx
            ok = sg.valid & (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx)
            cell = jnp.where(ok, (b * ny + yy) * nx + xx, ncells)
            cols = canvas[cell]  # [V, nzp] row gather
            for dz in (-1, 0, 1):
                zt = jnp.clip(z + dz + 1, 0, nzp - 1)
                taps[(dz, dy, dx)] = jnp.where(ok, _zselect(cols, zt), sg.cap)
    return jnp.stack(
        [taps[(dz, dy, dx)] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)]
    )


def gather_gemm(features: jax.Array, nbr: jax.Array, weights: jax.Array) -> jax.Array:
    """Sparse conv compute: out[v] = Σ_k feats[nbr[k, v]] @ W[k].

    features: [V, Cin]; nbr: [K, Vout]; weights: [K, Cin, Cout].
    Missing neighbors (index == V) read a zero row.
    """
    ext = jnp.concatenate([features, jnp.zeros((1, features.shape[1]), features.dtype)])
    gathered = ext[nbr]  # [K, Vout, Cin]
    return jnp.einsum(
        "kvc,kcd->vd", gathered, weights.astype(features.dtype),
        preferred_element_type=jnp.float32,
    ).astype(features.dtype)


def downsample_grid(
    sg: SparseGrid,
    cap_out: int,
    stride: Sequence[int] = (2, 2, 2),
    padding: Sequence[int] = (1, 1, 1),
    kernel_size: int = 3,
):
    """Active output sites of a strided sparse conv (spconv semantics: an
    output site exists iff any input site falls in its receptive field).

    Returns (out_grid: SparseGrid, out_shape). For k=3 each input contributes
    to at most 2 output sites per dim; we enumerate the 8 candidates.
    """
    nz, ny, nx = sg.grid
    s = np.asarray(stride)
    p = np.asarray(padding)
    out_shape = tuple(int((d + 2 * pp - kernel_size) // ss + 1)
                      for d, pp, ss in zip((nz, ny, nx), p, s))
    oz, oy, ox = out_shape

    zyx = sg.coords[:, 1:4]
    b = sg.coords[:, 0]
    # per-dim candidate outputs: o in [ceil((i - k + 1 + p)/s), floor((i + p)/s)]
    lo = -(-(zyx - kernel_size + 1 + p[None]) // s[None])
    hi = (zyx + p[None]) // s[None]
    cands = []
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                o = jnp.stack([lo[:, 0] + dz, lo[:, 1] + dy, lo[:, 2] + dx], -1)
                ok = (
                    (o[:, 0] <= hi[:, 0]) & (o[:, 1] <= hi[:, 1]) & (o[:, 2] <= hi[:, 2])
                    & (o[:, 0] >= 0) & (o[:, 0] < oz)
                    & (o[:, 1] >= 0) & (o[:, 1] < oy)
                    & (o[:, 2] >= 0) & (o[:, 2] < ox)
                    & sg.valid
                )
                key = ((b * oz + o[:, 0]) * oy + o[:, 1]) * ox + o[:, 2]
                cands.append((jnp.where(ok, key, -1).astype(jnp.int32), ok))
    all_keys = jnp.concatenate([c[0] for c in cands])
    all_ok = jnp.concatenate([c[1] for c in cands])
    # sort-free dedup: mark an occupancy canvas, then rank occupied cells by
    # prefix sum — output keys come out in ascending order (the SparseGrid
    # invariant) at ~1/3 the cost of sorting the 8V candidate list.
    size = sg.batch_size * oz * oy * ox
    occ = jnp.zeros((size + 1,), jnp.bool_).at[
        jnp.where(all_ok, all_keys, size)
    ].set(True, mode="drop")[:size]
    rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
    slot = jnp.where(occ, rank, cap_out)
    sentinel = jnp.iinfo(jnp.int32).max
    out_keys = (
        jnp.full((cap_out,), sentinel, jnp.int32)
        .at[slot].set(jnp.arange(size, dtype=jnp.int32), mode="drop")
    )
    out_valid = out_keys != sentinel
    uk = jnp.where(out_valid, out_keys, 0)
    x = uk % ox
    r = uk // ox
    y = r % oy
    r = r // oy
    z = r % oz
    bb = r // oz
    out_coords = jnp.where(
        out_valid[:, None], jnp.stack([bb, z, y, x], -1), -1
    ).astype(jnp.int32)
    out_sg = SparseGrid(
        keys=out_keys, coords=out_coords, valid=out_valid, grid=out_shape,
        batch_size=sg.batch_size,
    )
    return out_sg


def strided_neighbor_table(
    out_sg: SparseGrid, in_sg: SparseGrid, in_canvas: jax.Array,
    stride=(2, 2, 2), padding=(1, 1, 1), kernel_size: int = 3,
):
    """[K^3, Vout] input-site indices for a strided conv: input coord of tap k
    at output o is o*s - p + offs[k] (in the input grid)."""
    assert kernel_size == 3
    nz, ny, nx = in_sg.grid
    nzp = nz + 2
    ncells = in_sg.batch_size * ny * nx
    sz, sy, sx = stride
    pz, py, px = padding
    b = out_sg.coords[:, 0]
    oz, oy, ox = (out_sg.coords[:, i] for i in (1, 2, 3))
    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yy = oy * sy - py + dy
            xx = ox * sx - px + dx
            ok = out_sg.valid & (yy >= 0) & (yy < ny) & (xx >= 0) & (xx < nx)
            cell = jnp.where(ok, (b * ny + yy) * nx + xx, ncells)
            cols = in_canvas[cell]
            for dz in (-1, 0, 1):
                zt = jnp.clip(oz * sz - pz + dz + 1, 0, nzp - 1)
                taps[(dz, dy, dx)] = jnp.where(ok, _zselect(cols, zt), in_sg.cap)
    return jnp.stack(
        [taps[(dz, dy, dx)] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)]
    )


def inverse_neighbor_table(
    out_sg: SparseGrid, down_sg: SparseGrid, down_canvas: jax.Array,
    stride=(2, 2, 2), padding=(1, 1, 1), kernel_size: int = 3,
):
    """[K^3, Vout] table for SparseInverseConv: out_sg is the *original*
    (pre-downsample) level; tap k of output i reads the downsampled site o
    with o*s - p + offs[k] == i, i.e. o = (i + p - offs[k]) / s when integral.
    """
    assert kernel_size == 3
    dz_, dy_, dx_ = down_sg.grid
    nzp = dz_ + 2
    ncells = down_sg.batch_size * dy_ * dx_
    sz, sy, sx = stride
    pz, py, px = padding
    b = out_sg.coords[:, 0]
    z, y, x = (out_sg.coords[:, i] for i in (1, 2, 3))
    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny_num = y + py - dy
            nx_num = x + px - dx
            oy = ny_num // sy
            ox = nx_num // sx
            ok = (
                out_sg.valid
                & (oy * sy == ny_num) & (ox * sx == nx_num)
                & (oy >= 0) & (oy < dy_) & (ox >= 0) & (ox < dx_)
            )
            cell = jnp.where(ok, (b * dy_ + oy) * dx_ + ox, ncells)
            cols = down_canvas[cell]
            for dz in (-1, 0, 1):
                nz_num = z + pz - dz
                oz = nz_num // sz
                exact_z = oz * sz == nz_num
                zt = jnp.clip(oz + 1, 0, nzp - 1)
                val = jnp.where(ok & exact_z, _zselect(cols, zt), down_sg.cap)
                taps[(dz, dy, dx)] = val
    return jnp.stack(
        [taps[(dz, dy, dx)] for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)]
    )

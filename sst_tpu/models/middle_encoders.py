"""Densifying middle encoders: PointPillarsScatter + SECOND-style SparseEncoder.

TPU rebuild of:
  - /root/reference/mmdet3d/models/middle_encoders/pillar_scatter.py:9
    (PointPillarsScatter — pillar features → BEV pseudo-image)
  - /root/reference/mmdet3d/models/middle_encoders/sparse_encoder.py:15
    (SparseEncoder — subm conv_input → 4 encoder stages with stride-2
    downsamples → (3,1,1)/(2,1,1) conv_out → densify to [B, H, W, D*C])

Both produce NHWC BEV maps consumed by models/second.py. The sparse engine
(ops/sparse_conv.py) supplies neighbor tables; the z-only strided conv_out
gets its own table builder here because it is the single non-cubic kernel in
the reference stack.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.models.sparse_unet import SparseConvLayer
from sst_tpu.ops.sparse_conv_pallas import ConvPlan
from sst_tpu.ops.sparse_conv import (
    SparseGrid,
    _zselect,
    build_canvas,
    downsample_grid,
    strided_neighbor_table,
    subm_neighbor_table,
)


class PointPillarsScatter(nn.Module):
    """Scatter pillar features onto a dense BEV canvas (pillar_scatter.py:9).

    Call: (pillar_features [P, C], coors [P, 4] int32 (b, _, y, x),
    valid [P] bool). Returns [B, ny, nx, C].
    """

    in_channels: int
    output_shape: Tuple[int, int]  # (ny, nx)
    batch_size: int = 1

    @nn.compact
    def __call__(self, pillar_features, coors, valid):
        ny, nx = self.output_shape
        idx = (coors[:, 0] * ny + coors[:, 2]) * nx + coors[:, 3]
        idx = jnp.where(valid, idx, self.batch_size * ny * nx)
        canvas = jnp.zeros(
            (self.batch_size * ny * nx + 1, self.in_channels),
            pillar_features.dtype,
        )
        canvas = canvas.at[idx].set(
            jnp.where(valid[:, None], pillar_features, 0.0), mode="drop"
        )
        return canvas[:-1].reshape(self.batch_size, ny, nx, self.in_channels)


def zdown_grid_and_table(in_sg: SparseGrid, in_canvas, cap_out: int,
                         kz: int = 3, sz: int = 2):
    """Output grid + neighbor table for the z-only strided conv_out
    (sparse_encoder.py:90 SparseConv3d kernel (3,1,1), stride (2,1,1), pad 0).

    Returns (out_sg with grid (oz, ny, nx), nbr [kz, Vout])."""
    nz, ny, nx = in_sg.grid
    oz = (nz - kz) // sz + 1
    b, z, y, x = (in_sg.coords[:, i] for i in range(4))
    # candidate outputs per input z: o with o*sz <= z <= o*sz + kz - 1
    size = in_sg.batch_size * oz * ny * nx
    occ = jnp.zeros((size + 1,), jnp.bool_)
    for d in range((kz + sz - 1) // sz + 1):
        o = (z - kz + 1 + sz - 1) // sz + d
        ok = in_sg.valid & (o >= 0) & (o < oz) & (o * sz <= z) & (z < o * sz + kz)
        key = ((b * oz + o) * ny + y) * nx + x
        occ = occ.at[jnp.where(ok, key, size)].set(True, mode="drop")
    occ = occ[:size]
    rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
    slot = jnp.where(occ, rank, cap_out)
    sentinel = jnp.iinfo(jnp.int32).max
    out_keys = (
        jnp.full((cap_out,), sentinel, jnp.int32)
        .at[slot].set(jnp.arange(size, dtype=jnp.int32), mode="drop")
    )
    out_valid = out_keys != sentinel
    uk = jnp.where(out_valid, out_keys, 0)
    ox_ = uk % nx
    r = uk // nx
    oy_ = r % ny
    r = r // ny
    oz_ = r % oz
    ob = r // oz
    out_coords = jnp.where(
        out_valid[:, None], jnp.stack([ob, oz_, oy_, ox_], -1), -1
    ).astype(jnp.int32)
    out_sg = SparseGrid(
        keys=out_keys, coords=out_coords, valid=out_valid,
        grid=(oz, ny, nx), batch_size=in_sg.batch_size,
    )
    # taps: input z = o*sz + k at the same (y, x) column
    nzp = nz + 2
    ncells = in_sg.batch_size * ny * nx
    cell = jnp.where(out_valid, (ob * ny + oy_) * nx + ox_, ncells)
    cols = in_canvas[cell]
    taps = []
    for k in range(kz):
        zt = jnp.clip(oz_ * sz + k + 1, 0, nzp - 1)
        taps.append(jnp.where(out_valid, _zselect(cols, zt), in_sg.cap))
    return out_sg, jnp.stack(taps)


class SparseEncoder(nn.Module):
    """SECOND-style densifying sparse encoder (sparse_encoder.py:15).

    Call: (voxel_features [V, C], sg: SparseGrid at sparse_shape).
    Returns NHWC BEV map [B, ny/8, nx/8, output_channels * oz].
    """

    in_channels: int
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence] = (
        (1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    level_cap_ratios: Sequence[float] = (1.0, 0.75, 0.5, 0.35)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_features, sg: SparseGrid, train: bool = False):
        cap0 = sg.cap
        canvas = build_canvas(sg)
        nbr0 = subm_neighbor_table(sg, canvas)

        x = SparseConvLayer(
            self.base_channels, dtype=self.dtype, name="conv_input",
        )(voxel_features, ConvPlan(nbr=nbr0), sg.valid, train)

        cur_sg, cur_canvas, cur_nbr = sg, canvas, nbr0
        for i, blocks in enumerate(self.encoder_channels):
            for j, c in enumerate(blocks):
                if i != 0 and j == 0:
                    pad = self.encoder_paddings[i][0]
                    pad = (pad,) * 3 if isinstance(pad, int) else tuple(pad)
                    cap = max(128, int(cap0 * self.level_cap_ratios[i]))
                    nxt = downsample_grid(cur_sg, cap, (2, 2, 2), pad)
                    dn = strided_neighbor_table(
                        nxt, cur_sg, cur_canvas, (2, 2, 2), pad)
                    x = SparseConvLayer(
                        c, dtype=self.dtype, name=f"encoder_{i}_{j}_down",
                    )(x, ConvPlan(nbr=dn), nxt.valid, train)
                    cur_sg = nxt
                    cur_canvas = build_canvas(cur_sg)
                    cur_nbr = subm_neighbor_table(cur_sg, cur_canvas)
                else:
                    x = SparseConvLayer(
                        c, dtype=self.dtype, name=f"encoder_{i}_{j}",
                    )(x, ConvPlan(nbr=cur_nbr), cur_sg.valid, train)

        out_sg, znbr = zdown_grid_and_table(cur_sg, cur_canvas, cur_sg.cap)
        x = SparseConvLayer(
            self.output_channels, dtype=self.dtype, name="conv_out",
        )(x, ConvPlan(nbr=znbr), out_sg.valid, train)

        # densify: [V, C] -> [B, oz, ny, nx, C] -> NHWC [B, ny, nx, oz * C]
        oz, ny, nx = out_sg.grid
        b = out_sg.batch_size
        idx = jnp.where(out_sg.valid,
                        ((out_sg.coords[:, 0] * oz + out_sg.coords[:, 1]) * ny
                         + out_sg.coords[:, 2]) * nx + out_sg.coords[:, 3],
                        b * oz * ny * nx)
        dense = jnp.zeros((b * oz * ny * nx + 1, x.shape[-1]), x.dtype)
        dense = dense.at[idx].set(
            jnp.where(out_sg.valid[:, None], x, 0.0), mode="drop")[:-1]
        dense = dense.reshape(b, oz, ny, nx, x.shape[-1])
        return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(
            b, ny, nx, oz * x.shape[-1])

"""TPU-native dense-BEV backbone — the fast path for FSD-family segmentors.

The reference's production segmentor is a spconv 3D UNet
(/root/reference/mmdet3d/models/middle_encoders/sparse_unet.py:324
SimpleSparseUNet). On GPU, rulebook sparse conv touches only active pairs; on
TPU the same computation lowers to 27-tap random row gathers, which are
HBM-latency-bound and leave the MXU idle (measured: ~130 ms of gathers per
frame at Waymo scale, >40% of e2e).

This module is the TPU-first redesign of that stage: pack z into the feature
dimension (learned z-embedding + max scatter), run a dense 2D BEV UNet —
every FLOP lands on the MXU, every HBM access is contiguous — and re-inject
z at the per-voxel devoxelize step so downstream consumers still see
per-3D-voxel features. The sparse UNet path remains available
(``VoteSegmentor(backbone="sparse")``) for exact reference-topology parity;
both paths train to the same synthetic AP (tests/test_dense_bev.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.models.layers import ConvNormAct, MLP
from sst_tpu.ops.segment import INT_SENTINEL, unique_segments_canvas


def bev_cell_ids(coords, grid_hw, valid):
    """[V,4] (b,z,y,x) coords → flat BEV cell id b*H*W + y*W + x (pad → H*W*B)."""
    h, w = grid_hw
    cell = (coords[:, 0] * h + coords[:, 2]) * w + coords[:, 3]
    return jnp.where(valid, cell, -1)


class BEVScatter(nn.Module):
    """Scatter per-voxel features onto a dense BEV canvas.

    z_groups=1 (legacy): z is folded into features via a learned embedding
    before a max-reduce over each xy column (PointPillars-style collapse,
    but at 3D-voxel granularity so thin structures at different heights stay
    separable). Assumes feats are post-ReLU (>= 0), so an all-zeros canvas
    cell reads as "empty"; an explicit occupancy channel is appended.

    z_groups=G>1: the z axis is split into G bands and each band gets its
    own channel slice (max-reduce only WITHIN a band, intra-band z still
    embedded) — a column containing ground + pedestrian keeps them in
    separate channels instead of max-merging them, which is what costs the
    legacy collapse pedestrian mAP (AB_DENSE_SPARSE_r03.json). Features are
    first projected to ``pre_channels`` so the canvas stays narrow
    (G*(pre_channels+1) channels).
    """

    nz: int
    z_groups: int = 1
    pre_channels: int = 0  # 0 = scatter feats at native width
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, valid, batch_size: int, grid_hw,
                 train: bool = False):
        h, w = grid_hw
        g_n = self.z_groups
        x = feats
        if self.pre_channels:
            x = MLP((self.pre_channels,), norm="ln", dtype=self.dtype,
                    name="pre")(x, valid, train)
            x = nn.relu(x)  # keep >= 0 so empty canvas cells read as zero
        c = x.shape[-1]
        zemb = self.param("z_embed", nn.initializers.normal(0.02),
                          (self.nz, c), jnp.float32)
        z = jnp.clip(coords[:, 1], 0, self.nz - 1)
        x = (x + zemb[z].astype(x.dtype))
        # occupancy rides as channel c of the SAME scatter: a post-hoc
        # concat of two (B*H*W*G, .) canvases materializes a full canvas
        # copy (~19 ms at 640²xG=6 — the 'copy' class in the z6 bench trace)
        x = jnp.concatenate([x, jnp.ones((x.shape[0], 1), x.dtype)], -1)
        x = jnp.where(valid[:, None], x, 0.0)
        cell = (coords[:, 0] * h + coords[:, 2]) * w + coords[:, 3]
        n = x.shape[0]
        # Direct scatter-max into the canvas is the naive form; profiled
        # 32 ms at 640²xG=6 (wide f32 scatter, transposed tiling). Instead:
        # dense site ids for the occupied cells (sort-free canvas unique —
        # the key space is the canvas itself), max-reduce voxels into a
        # COMPACT site table, then build the canvas with an s32 inverse
        # index + contiguous row gather (same pattern as DenseBEVMixer;
        # scatters run at 15-115 GB/s on this hardware, row gathers 2-4x
        # faster).
        #
        # Rows are FULL xy cells of G*(c+1) channels, not (cell, band)
        # pairs of c+1: TPU tiles the minor dim to 128 lanes, so a
        # 25-channel row physically moves 128 lanes of HBM traffic — the
        # per-band layout cost ~4x its logical bytes in the scatter, the
        # canvas gather AND a relayout copy before the first conv. Each
        # voxel widens into its band's channel slice (zeros elsewhere);
        # same-cell voxels from different bands max-merge disjoint slices,
        # which is exact.
        if g_n > 1:
            grp = (z * g_n) // self.nz
            onehot = grp[:, None] == jnp.arange(g_n, dtype=grp.dtype)[None, :]
            x = (onehot[:, :, None].astype(x.dtype)
                 * x[:, None, :]).reshape(n, g_n * (c + 1))
        size = batch_size * h * w
        cell_key = jnp.where(valid, cell, size)
        uniq = unique_segments_canvas(cell_key, valid, num_segments=n,
                                      key_space=size)
        sites = jnp.zeros((n + 1, g_n * (c + 1)), x.dtype).at[
            uniq.seg_ids].max(x, mode="drop")
        site_valid = uniq.unique_keys != INT_SENTINEL
        inv = jnp.full((size,), n, jnp.int32).at[
            jnp.where(site_valid, uniq.unique_keys, size)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        ext = sites.at[n].set(0.0)
        canvas = ext[inv]
        return canvas.reshape(batch_size, h, w, g_n * (c + 1))


class DenseBEVUNet(nn.Module):
    """2D BEV encoder-decoder with stride-2 downsamples and lateral adds.

    encoder_channels[i] are the conv widths at scale 1/2^i (the first conv of
    scale i>0 is the stride-2 downsample). decoder runs deepest-first;
    ``decoder_channels[d]`` is the width after merging with the lateral at
    scale (num_scales-2-d). Returns the full-res output map plus every
    decoder map (deepest-first) for multiscale consumers.
    """

    encoder_channels: tuple = ((64, 64), (128, 128), (256, 256), (256, 256))
    decoder_channels: tuple = (256, 128, 128)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        enc = []
        for i, widths in enumerate(self.encoder_channels):
            for j, cch in enumerate(widths):
                stride = 2 if (i > 0 and j == 0) else 1
                x = ConvNormAct(cch, 3, stride=stride, dtype=self.dtype,
                                name=f"enc_{i}_{j}")(x, train)
            enc.append(x)

        dec_maps = []
        x = enc[-1]
        for d, cch in enumerate(self.decoder_channels):
            skip = enc[len(self.encoder_channels) - 2 - d]
            b, hh, ww, _ = skip.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = ConvNormAct(cch, 3, dtype=self.dtype, name=f"up_{d}")(x, train)
            lat = ConvNormAct(cch, 1, dtype=self.dtype, name=f"lat_{d}")(skip, train)
            x = ConvNormAct(cch, 3, dtype=self.dtype, name=f"merge_{d}")(
                x + lat, train)
            dec_maps.append(x)
        out = ConvNormAct(self.out_channels, 3, dtype=self.dtype,
                          name="out_conv")(x, train)
        return out, dec_maps


class DenseVoxelDecode(nn.Module):
    """Per-3D-voxel features from a BEV map: gather the voxel's xy cell and
    re-inject z via an embedding + fuse MLP (the devoxelize counterpart of
    BEVScatter's z-collapse).

    With z_groups=G>1 the BEV map is read as G z-band slices of
    ``group_channels`` each (matching the grouped BEVScatter / a UNet
    out_channels of G*group_channels): each voxel gathers ITS band's slice,
    so two voxels sharing an xy column at different heights decode from
    different channels."""

    nz: int
    out_channels: int = 128
    z_groups: int = 1
    group_channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev, coords, valid, train: bool = False):
        b, h, w, c = bev.shape
        g_n = self.z_groups
        z = jnp.clip(coords[:, 1], 0, self.nz - 1)
        cell = (coords[:, 0] * h + coords[:, 2]) * w + coords[:, 3]
        flat = bev.reshape(b * h * w, c)
        rows = flat[jnp.clip(cell, 0, b * h * w - 1)]
        if g_n == 1:
            g = rows
        else:
            # gather the FULL cell row and one-hot-select the voxel's band
            # slice: a per-(cell, band) gather of group_channels-wide rows
            # pads each row to 128 lanes (4-5x its logical HBM bytes) and
            # forces a relayout copy of the whole map first.
            cz = self.group_channels
            grp = (z * g_n) // self.nz
            onehot = grp[:, None] == jnp.arange(g_n, dtype=grp.dtype)[None, :]
            g = (rows.reshape(-1, g_n, cz)
                 * onehot[:, :, None].astype(rows.dtype)).sum(axis=1)
        zemb = self.param("z_embed", nn.initializers.normal(0.02),
                          (self.nz, 32), jnp.float32)
        x = jnp.concatenate([g, zemb[z].astype(g.dtype)], -1)
        x = MLP((self.out_channels,), norm="ln", dtype=self.dtype,
                name="fuse")(x, valid, train)
        return jnp.where(valid[:, None], x, 0.0)


class DenseBEVMixer(nn.Module):
    """TPU-native VirtualVoxelMixer: z-sliced scatter (z kept as channel
    groups), small 2D UNet over the virtual BEV grid, per-site z-slice
    gather + projection back to per-voxel features.

    Counterpart of reference sparse_unet.py:417 (VirtualVoxelMixer) for the
    dense flagship path; the sparse mixer remains the parity path.
    """

    nz: int
    z_channels: int = 32
    output_channels: int = 128
    encoder_channels: tuple = ((128, 128), (128, 128))
    decoder_channels: tuple = (128,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, valid, batch_size: int, grid_hw,
                 train: bool = False):
        h, w = grid_hw
        cz = self.z_channels
        x = MLP((cz,), norm="ln", dtype=self.dtype, name="pre")(
            feats, valid, train)
        x = nn.relu(x)  # keep >= 0 so empty canvas cells read as zero
        z = jnp.clip(coords[:, 1], 0, self.nz - 1)
        cell = (coords[:, 0] * h + coords[:, 2]) * w + coords[:, 3]
        n = x.shape[0]
        size = batch_size * h * w
        # Canvas rows are FULL xy cells of nz*cz channels: per-(cell, z)
        # rows of cz=32 channels pad to 128 lanes on TPU (4x their logical
        # HBM bytes through the gather) and force a relayout copy at the
        # [B,H,W,nz*cz] reshape. Each site widens into its z slice (zeros
        # elsewhere); virtual sites are unique per (cell, z), so same-cell
        # sites occupy disjoint slices and a segment-max merge is exact
        # (x >= 0 post-ReLU). The compact-site + s32 inverse-index + row
        # gather pattern mirrors BEVScatter.
        onehot = z[:, None] == jnp.arange(self.nz, dtype=z.dtype)[None, :]
        xw = (onehot[:, :, None].astype(x.dtype)
              * jnp.where(valid[:, None], x, 0.0)[:, None, :]
              ).reshape(n, self.nz * cz)
        cell_key = jnp.where(valid, cell, size)
        uniq = unique_segments_canvas(cell_key, valid, num_segments=n,
                                      key_space=size)
        sites = jnp.zeros((n + 1, self.nz * cz), x.dtype).at[
            uniq.seg_ids].max(xw, mode="drop")
        site_valid = uniq.unique_keys != INT_SENTINEL
        inv = jnp.full((size,), n, jnp.int32).at[
            jnp.where(site_valid, uniq.unique_keys, size)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        ext = sites.at[n].set(0.0)
        canvas = ext[inv].reshape(batch_size, h, w, self.nz * cz)
        out2d, _ = DenseBEVUNet(
            encoder_channels=self.encoder_channels,
            decoder_channels=self.decoder_channels,
            out_channels=self.nz * cz, dtype=self.dtype, name="unet",
        )(canvas, train)
        rows = out2d.reshape(size, self.nz * cz)[
            jnp.clip(cell, 0, size - 1)]
        back = (rows.reshape(n, self.nz, cz)
                * onehot[:, :, None].astype(rows.dtype)).sum(axis=1)
        y = jnp.concatenate([back, x], -1)
        y = MLP((self.output_channels,), norm="ln", dtype=self.dtype,
                name="post")(y, valid, train)
        return jnp.where(valid[:, None], y, 0.0)

"""SimpleSparseUNet — FSD's fully-sparse segmentation backbone.

TPU rebuild of /root/reference/mmdet3d/models/middle_encoders/sparse_unet.py
(:16 SparseUNet topology, :324 SimpleSparseUNet which skips the densify):
submanifold conv_input → 5 encoder stages (stride-2 sparse conv + subm
blocks) → symmetric decoder (lateral SparseBasicBlock + merge + channel-
reduce residual + SparseInverseConv upsample).

Index plans (neighbor tables per level) are precomputed once per forward in
:func:`build_unet_plan` and shared by every conv at that level — the analog
of spconv's ``indice_key`` caching.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.models.layers import ACTIVATIONS, MaskedBatchNorm
from sst_tpu.ops.sparse_conv import SparseGrid, downsample_grid
from sst_tpu.ops.sparse_conv_pallas import (
    ConvPlan,
    build_conv_plans,
    build_window_plan,
    use_window_plans,
    windowed_sparse_conv,
)


@struct.dataclass
class UNetPlan:
    levels: tuple  # tuple[SparseGrid], level 0 = input resolution
    subm: tuple  # ConvPlan per level
    down: tuple  # ConvPlan level l-1 → l, for l >= 1
    inv: tuple  # ConvPlan level l → l-1, for l >= 1


def build_unet_plan(
    sg0: SparseGrid,
    level_caps: Sequence[int],
    strides: Sequence[tuple],
    paddings: Sequence[tuple],
) -> UNetPlan:
    """Args: level_caps[0] must equal sg0.cap; strides/paddings for each
    downsample (len == num_levels - 1).

    On TPU each conv family gets a Pallas window plan (bounds + aux lanes,
    ops/sparse_conv_pallas.py) — the strided/inverse pair at one level
    share their two window plans as each other's transpose.  Off-TPU the
    plans hold XLA neighbor tables instead (same semantics)."""
    assert level_caps[0] == sg0.cap
    use_w = use_window_plans()
    levels = [sg0]
    subm = [build_conv_plans(sg0, sg0, "subm", use_windows=use_w)]
    down, inv = [], []
    for i, (s, p) in enumerate(zip(strides, paddings)):
        prev = levels[-1]
        nxt = downsample_grid(prev, level_caps[i + 1], s, p)
        levels.append(nxt)
        subm.append(build_conv_plans(nxt, nxt, "subm", use_windows=use_w))
        big = prev.grid[0] * prev.grid[1] * prev.grid[2] >= (1 << 24)
        if use_w and not big:
            wp_s = build_window_plan(nxt, prev, "strided", s, p)
            wp_i = build_window_plan(prev, nxt, "inverse", s, p)
            down.append(ConvPlan(fwd=wp_s, bwd=wp_i, out_sg=nxt,
                                 in_grid=prev.grid, stride=s, padding=p))
            inv.append(ConvPlan(fwd=wp_i, bwd=wp_s, out_sg=prev,
                                in_grid=nxt.grid, stride=s, padding=p))
        else:
            down.append(build_conv_plans(nxt, prev, "strided", s, p,
                                         use_windows=False))
            inv.append(build_conv_plans(prev, nxt, "inverse", s, p,
                                        use_windows=False))
    return UNetPlan(
        levels=tuple(levels), subm=tuple(subm),
        down=tuple(down), inv=tuple(inv),
    )


class SparseConvLayer(nn.Module):
    """conv(+norm+act) over a precomputed neighbor table."""

    out_channels: int
    order: tuple = ("conv", "norm", "act")
    act: str = "relu"
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, cp: ConvPlan, out_valid, train: bool):
        cin = feats.shape[-1]
        # window plans are always 27-tap; an explicit XLA table may carry
        # fewer (e.g. SparseEncoder's z-only (3,1,1) conv_out)
        k = cp.nbr.shape[0] if cp.nbr is not None else 27
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, self.out_channels), jnp.float32,
        )
        x = windowed_sparse_conv(feats, w.astype(feats.dtype), cp)
        x = jnp.where(out_valid[:, None], x, 0.0)
        if self.use_norm:
            x = MaskedBatchNorm(dtype=self.dtype)(x, out_valid, train)
        x = ACTIVATIONS[self.act](x)
        return jnp.where(out_valid[:, None], x, 0.0)


class SparseBasicBlock(nn.Module):
    """ResNet basic block with submanifold convs (ops/sparse_block.py)."""

    channels: int
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, cp: ConvPlan, valid, train: bool):
        identity = feats
        x = SparseConvLayer(self.channels, act=self.act, dtype=self.dtype,
                            name="conv1")(feats, cp, valid, train)
        x = SparseConvLayer(self.channels, act="none", dtype=self.dtype,
                            name="conv2")(x, cp, valid, train)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False, dtype=self.dtype,
                                name="downsample")(identity)
        x = ACTIVATIONS[self.act](x + identity)
        return jnp.where(valid[:, None], x, 0.0)


class SimpleSparseUNet(nn.Module):
    in_channels: int = 64
    base_channels: int = 64
    output_channels: int = 128  # unused in Simple variant (no densify)
    encoder_channels: tuple = (
        (64,), (64, 64, 64), (64, 64, 64), (128, 128, 128), (256, 256, 256)
    )
    decoder_channels: tuple = (
        (256, 256, 128), (128, 128, 64), (64, 64, 64), (64, 64, 64), (64, 64, 64)
    )
    act: str = "relu"
    return_multiscale: bool = False
    # rematerialize each sparse conv in the backward pass: the gather-GEMM
    # expands [N, 27, C] neighbor features per conv (~1.4 GB per full-cap
    # layer), which at flagship scale overflows HBM when stored for the
    # backward. jax.checkpoint trades one recompute for that storage.
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, plan: UNetPlan, train: bool = False):
        num_stages = len(self.encoder_channels)
        conv_cls = nn.remat(SparseConvLayer, static_argnums=(4,)) \
            if self.remat else SparseConvLayer
        block_cls = nn.remat(SparseBasicBlock, static_argnums=(4,)) \
            if self.remat else SparseBasicBlock
        x = conv_cls(self.base_channels, act=self.act, dtype=self.dtype,
                     name="conv_input")(
            feats, plan.subm[0], plan.levels[0].valid, train)

        encode = []
        for i, blocks in enumerate(self.encoder_channels):
            lvl = i  # stage i lives at level i (stage 0 at input res)
            for j, c in enumerate(blocks):
                if i != 0 and j == 0:
                    # strided conv: level i-1 → i
                    x = conv_cls(
                        c, act=self.act, dtype=self.dtype,
                        name=f"encoder_{i}_{j}_down",
                    )(x, plan.down[i - 1], plan.levels[i].valid, train)
                else:
                    x = conv_cls(
                        c, act=self.act, dtype=self.dtype,
                        name=f"encoder_{i}_{j}",
                    )(x, plan.subm[lvl], plan.levels[lvl].valid, train)
            encode.append(x)

        # decoder: stage s from num_stages down to 1
        decode = []
        x = encode[-1]
        for d, chans in enumerate(self.decoder_channels):
            s = num_stages - d  # 5..1
            lvl = s - 1
            lateral = block_cls(
                chans[0], act=self.act, dtype=self.dtype, name=f"lateral_{s}"
            )(encode[lvl], plan.subm[lvl], plan.levels[lvl].valid, train)
            cat = jnp.concatenate([x, lateral], axis=-1)
            merge = conv_cls(
                chans[1], act=self.act, dtype=self.dtype, name=f"merge_{s}"
            )(cat, plan.subm[lvl], plan.levels[lvl].valid, train)
            # channel-reduce residual (sparse_unet.py:189-206)
            n, cin = cat.shape
            red = cat.reshape(n, chans[1], cin // chans[1]).sum(-1)
            x = merge + red
            if s != 1:
                x = conv_cls(
                    chans[2], act=self.act, dtype=self.dtype,
                    name=f"upsample_{s}",
                )(x, plan.inv[lvl - 1], plan.levels[lvl - 1].valid, train)
            else:
                x = conv_cls(
                    chans[2], act=self.act, dtype=self.dtype,
                    name=f"upsample_{s}",
                )(x, plan.subm[0], plan.levels[0].valid, train)
            decode.append(x)

        out = {
            "voxel_feats": decode[-1],
            "voxel_coords": plan.levels[0].coords,
            "voxel_valid": plan.levels[0].valid,
        }
        if self.return_multiscale:
            out["decoder_features"] = decode
        return out


class VirtualVoxelMixer(nn.Module):
    """FSDv2's small sparse UNet over the virtual-voxel grid + submanifold
    conv_out (reference sparse_unet.py:417-505)."""

    base_channels: int = 64
    output_channels: int = 128
    encoder_channels: tuple = ((64,), (64, 64), (64, 64))
    decoder_channels: tuple = ((64, 64, 64), (64, 64, 64), (64, 64, 64))
    act: str = "relu"
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, plan: UNetPlan, train: bool = False):
        out = SimpleSparseUNet(
            base_channels=self.base_channels,
            encoder_channels=self.encoder_channels,
            decoder_channels=self.decoder_channels,
            act=self.act, remat=self.remat, dtype=self.dtype, name="unet",
        )(feats, plan, train)
        x = SparseConvLayer(
            self.output_channels, act=self.act, dtype=self.dtype, name="conv_out",
        )(out["voxel_feats"], plan.subm[0], plan.levels[0].valid, train)
        return x

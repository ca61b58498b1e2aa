"""SST backbone: windowed multi-head attention over bucketed dense windows.

TPU rebuild of SSTv2 + BasicShiftBlockV2 + WindowAttention + EncoderLayer
(/root/reference/mmdet3d/models/backbones/sst_v2.py:17,
 mmdet3d/models/sst/sst_basic_block_v2.py:14,77,129).

Once region batching has produced fixed [num_windows, max_tokens, C] tensors,
windowed sparse attention is plain batched dense MHA — exactly what the MXU
wants. The per-bucket python loop is over a static, small bucket count.

Not ported: SRABlock (models/sst/sra_block.py) and the SST backbone built on
it (backbones/sst.py) — that file opens with "Do not use this file. Please
wait for future release", imports ipdb, and no shipped config references it;
it is unreleased dead code in the reference. SSTv1/SSTv2 below cover every
config the reference ships.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sst_tpu.models.layers import ACTIVATIONS
from sst_tpu.models.sst_input import SSTPlan
from sst_tpu.ops.window import flat2window, window2flat, window_key_padding


class WindowAttention(nn.Module):
    """Bucketed windowed MHA (sst_basic_block_v2.py:14 WindowAttention).

    Hand-rolled instead of nn.MultiHeadDotProductAttention: projections run
    on the FLAT [N, C] tokens (full 128-lane tiles, one gather into window
    form instead of three), and the per-bucket attention is two einsums +
    a masked softmax — measured ~2x less layout-copy time on TPU than the
    flax module at T in {30..144}, d_head 16."""

    d_model: int
    nhead: int
    cosine: bool = False  # Swin-v2 cosine attention (cosine_msa.py:449)
    tau_min: float = 0.01
    non_shared_tau: bool = False
    # None = auto (single TPU device, or inside the shard_map train step);
    # config key ``use_pallas`` forces the fused kernel on/off.
    use_pallas: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, pos, f2w):
        h = self.nhead
        dh = self.d_model // h
        if self.cosine:
            n_tau = h if self.non_shared_tau else 1
            tau = self.param("tau", nn.initializers.ones, (n_tau,), jnp.float32)
            tau = jnp.maximum(jnp.repeat(tau, h // n_tau), self.tau_min)
        x = feat + pos.astype(feat.dtype)
        # flat projections: [N, C] x [C, 2C] — MXU-friendly
        qk = nn.Dense(2 * self.d_model, dtype=self.dtype, name="qk_proj")(x)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(feat)
        # fused Pallas kernel on TPU (keeps logits/softmax/AV in VMEM;
        # 2-4x faster than the einsum path); cosine mode + CPU use einsum.
        import os

        from sst_tpu.utils.dist import data_axis

        # pallas_call is opaque to pjit's GSPMD partitioner, so the kernel
        # runs when each device sees a whole (per-shard) array: single
        # device, or inside the shard_map train step (utils/dist.py binds
        # the axis). SST_TPU_FORCE_PALLAS overrides for external shard_map
        # users; SST_TPU_PALLAS_INTERPRET exercises the kernel path on CPU
        # meshes (tests).
        if self.use_pallas is not None:
            auto = self.use_pallas
        else:
            auto = bool(
                os.environ.get("SST_TPU_FORCE_PALLAS")
                or os.environ.get("SST_TPU_PALLAS_INTERPRET")
                or (jax.default_backend() == "tpu"
                    and (len(jax.devices()) == 1
                         or data_axis() is not None))
            )
        use_pallas = (
            (not self.cosine)
            and not os.environ.get("SST_TPU_NO_PALLAS_MHA")
            and auto
        )
        # ONE wide gather instead of three: row-gather cost on TPU is
        # per-row-bound, not bandwidth-bound (profiled 165 GB/s at 512 B
        # rows), so gathering [N, 3C] costs ~1/3 of three [N, C] gathers.
        # On the Pallas path the kernel consumes bf16 anyway — cast on the
        # compact flat rows so the padded-window gather moves half the bytes.
        qkv = jnp.concatenate([qk, v], axis=-1)
        if use_pallas:
            qkv = qkv.astype(jnp.bfloat16)
        qkv_d = flat2window(qkv, f2w)
        pads = window_key_padding(f2w)
        scale = 1.0 / np.sqrt(dh)
        outs = []
        for qkvw, pad in zip(qkv_d, pads):
            qw, kw, vw = jnp.split(qkvw, 3, axis=-1)
            w, t, _ = qw.shape
            if use_pallas:
                from sst_tpu.ops.pallas_attention import window_mha

                # stay bf16 through the window2flat gather; cast once on the
                # compact flat rows below
                outs.append(window_mha(qw, kw, vw, pad, h))
                continue
            q4 = qw.reshape(w, t, h, dh).astype(jnp.bfloat16)
            k4 = kw.reshape(w, t, h, dh).astype(jnp.bfloat16)
            v4 = vw.reshape(w, t, h, dh).astype(jnp.bfloat16)
            # bf16 logits/softmax: the [W, H, T, T] tensor is the bandwidth
            # hot spot (59M elements for the 30-token bucket); max-subtracted
            # bf16 softmax is plenty for T<=144 windows.
            if self.cosine:
                q4 = q4 / jnp.maximum(
                    jnp.linalg.norm(q4.astype(jnp.float32), axis=-1,
                                    keepdims=True), 1e-6).astype(q4.dtype)
                k4 = k4 / jnp.maximum(
                    jnp.linalg.norm(k4.astype(jnp.float32), axis=-1,
                                    keepdims=True), 1e-6).astype(k4.dtype)
            logits = jnp.einsum(
                "wthd,wshd->whts", q4, k4,
                preferred_element_type=jnp.bfloat16,
            )
            if self.cosine:
                logits = logits / tau[None, :, None, None].astype(logits.dtype)
            else:
                logits = logits * jnp.bfloat16(scale)
            logits = logits + jnp.where(
                pad[:, None, None, :], jnp.bfloat16(-1e4), jnp.bfloat16(0)
            )
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("whts,wshd->wthd", probs, v4)
            outs.append(out.reshape(w, t, self.d_model).astype(feat.dtype))
        flat = window2flat(outs, f2w).astype(feat.dtype)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(flat)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (sst_basic_block_v2.py:77)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "gelu"
    post_norm: bool = True
    cosine: bool = False
    use_pallas: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, f2w):
        act = ACTIVATIONS[self.activation]
        if self.post_norm:
            src2 = WindowAttention(self.d_model, self.nhead, self.cosine,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype)(src, pos, f2w)
            src = nn.LayerNorm(dtype=self.dtype)(src + src2)
            src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype)(src)
            src2 = nn.Dense(self.d_model, dtype=self.dtype)(act(src2))
            src = nn.LayerNorm(dtype=self.dtype)(src + src2)
        else:
            src2 = nn.LayerNorm(dtype=self.dtype)(src)
            src2 = WindowAttention(self.d_model, self.nhead, self.cosine,
                                   use_pallas=self.use_pallas,
                                   dtype=self.dtype)(src2, pos, f2w)
            src = src + src2
            src2 = nn.LayerNorm(dtype=self.dtype)(src)
            src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype)(src2)
            src = src + nn.Dense(self.d_model, dtype=self.dtype)(act(src2))
        return src


class BasicShiftBlock(nn.Module):
    """Two encoder layers: shift0 then shift1 (sst_basic_block_v2.py:129)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    activation: str = "gelu"
    cosine: bool = False
    use_pallas: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, plan: SSTPlan):
        for i in range(2):
            src = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                self.activation, cosine=self.cosine,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"encoder_{i}",
            )(src, plan.pos[i], plan.f2w[i])
        return src


def recover_bev(voxel_feat, voxel_coords, voxel_valid, batch_size: int, output_shape):
    """Scatter sparse voxel features onto a dense [B, ny, nx, C] canvas
    (sst_v2.py:161-199) — NHWC, single fused scatter instead of a batch loop."""
    ny, nx = output_shape
    c = voxel_feat.shape[-1]
    flat_idx = (voxel_coords[:, 0] * ny + voxel_coords[:, 2]) * nx + voxel_coords[:, 3]
    flat_idx = jnp.where(voxel_valid, flat_idx, batch_size * ny * nx)
    canvas = jnp.zeros((batch_size * ny * nx, c), voxel_feat.dtype)
    canvas = canvas.at[flat_idx].set(
        jnp.where(voxel_valid[:, None], voxel_feat, 0.0), mode="drop"
    )
    return canvas.reshape(batch_size, ny, nx, c)


class SSTv2(nn.Module):
    """Single-stride Sparse Transformer backbone (sst_v2.py:17)."""

    d_model: Sequence[int] = (128,) * 6
    nhead: Sequence[int] = (8,) * 6
    num_blocks: int = 6
    dim_feedforward: Sequence[int] = (256,) * 6
    activation: str = "gelu"
    output_shape: tuple = (468, 468)
    num_attached_conv: int = 3
    conv_kwargs: tuple = (
        {"kernel_size": 3, "dilation": 1},
        {"kernel_size": 3, "dilation": 1},
        {"kernel_size": 3, "dilation": 2},
    )
    conv_out_channel: int = 128
    in_channel: int | None = None
    to_bev: bool = True
    conv_shortcut: bool = False
    cosine: bool = False  # Swin-v2 cosine attention in every block
    use_pallas: bool | None = None  # config override of the fused-MHA gate
    remat_blocks: bool = True  # jax.checkpoint each block (HBM for FLOPs)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, voxel_coords, plan: SSTPlan, batch_size: int,
                 train: bool = False):
        x = voxel_feats.astype(self.dtype)
        if self.in_channel is not None:
            x = nn.Dense(self.d_model[0], dtype=self.dtype, name="linear0")(x)
        block_cls = nn.remat(BasicShiftBlock) if self.remat_blocks else BasicShiftBlock
        for i in range(self.num_blocks):
            x = block_cls(
                self.d_model[i], self.nhead[i], self.dim_feedforward[i],
                self.activation, cosine=self.cosine,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"block_{i}",
            )(x, plan)

        valid = plan.valid
        if not self.to_bev:
            return x, valid

        bev = recover_bev(x, voxel_coords, valid, batch_size, self.output_shape)
        from sst_tpu.models.layers import ConvNormAct

        for i in range(self.num_attached_conv):
            kw = dict(self.conv_kwargs[i]) if isinstance(self.conv_kwargs, (list, tuple)) else dict(self.conv_kwargs)
            kw.pop("padding", None)
            kw.pop("stride", None)
            out = ConvNormAct(
                self.conv_out_channel, act="relu", dtype=self.dtype,
                name=f"attached_conv_{i}", **kw,
            )(bev, train)
            if self.conv_shortcut and out.shape == bev.shape:
                bev = out + bev
            else:
                bev = out
        return bev, valid


class SSTv1(SSTv2):
    """SSTv1 (backbones/sst_v1.py:18) — the first-release backbone used by the
    reference's sst_waymoD5_1x_3class_{8,12}heads.py configs.

    Under the static-shape window plan the v1 and v2 forward paths coincide:
    v1's 2D in-window position embedding (sst_v1.py:225-258) is exactly what
    :func:`sinusoidal_window_pos` emits for 2D window shapes, v1's per-layer
    flat2window/window2flat (sst_basic_block.py) is the same SSTPlan reuse,
    and v1's key-padding masks are the plan's bucket masks. Only the defaults
    differ (two dilation-2 attached convs, conv_kwargs of sst_v1.py:52) —
    expressed as dataclass defaults so ``type='SSTv1'`` configs build the v1
    topology.
    """

    num_attached_conv: int = 2
    conv_kwargs: tuple = (
        {"kernel_size": 3, "dilation": 2},
        {"kernel_size": 3, "dilation": 2},
    )

"""Shared NN building blocks (flax.linen).

``MaskedBatchNorm`` replaces the reference's NaiveSyncBatchNorm1d
(/root/reference/mmdet3d/ops/norm.py:29) — statistics over *valid* rows only
(padding slots excluded). Under pjit the batch axis is global, so XLA inserts
the cross-device reduction automatically; no explicit all_gather is needed
(the NCCL all_gather in norm.py:11-26 becomes an implicit psum).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ACTIVATIONS = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "silu": nn.silu,
    "swish": nn.silu,
    "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
    "elu": nn.elu,
    "none": lambda x: x,
}


class MaskedBatchNorm(nn.Module):
    """BatchNorm over rows of [N, C] with a validity mask.

    Running stats live in the 'batch_stats' collection like nn.BatchNorm.
    """

    momentum: float = 0.99
    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            # Under the shard_map train step the statistics are psum'd over
            # the data axis — NaiveSyncBN parity (reference ops/norm.py:29:
            # all-reduce of per-rank (count, sum, sumsq) because per-rank
            # voxel counts differ wildly). Under pjit/GSPMD the arrays are
            # global and XLA inserts the same collectives automatically.
            from sst_tpu.utils.dist import psum_if_dist

            m = mask.astype(jnp.float32)[:, None]
            xf = x.astype(jnp.float32)
            s0, s1, s2 = psum_if_dist(
                (m.sum(), (xf * m).sum(0), (jnp.square(xf) * m).sum(0)))
            n = jnp.maximum(s0, 1.0)
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Linear+Norm+Act stack (reference build_mlp, sst_ops.py:334)."""

    hidden: Sequence[int]
    act: str = "relu"
    norm: str = "bn"  # 'bn' | 'ln' | 'none'
    is_head: bool = False
    bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        act = ACTIVATIONS[self.act]
        for i, c in enumerate(self.hidden):
            last = i == len(self.hidden) - 1
            if last and self.is_head:
                x = nn.Dense(c, use_bias=True, dtype=self.dtype)(x)
            else:
                x = nn.Dense(c, use_bias=self.bias, dtype=self.dtype)(x)
                if self.norm == "bn":
                    x = MaskedBatchNorm(dtype=self.dtype)(
                        x, mask if mask is not None else jnp.ones(x.shape[0], bool), train
                    )
                elif self.norm == "ln":
                    x = nn.LayerNorm(dtype=self.dtype)(x)
                x = act(x)
        return x


class ConvNormAct(nn.Module):
    """Conv2d (NHWC) + BN + ReLU for BEV maps."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    act: str = "relu"
    use_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=pad,
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return ACTIVATIONS[self.act](x)

"""SECOND backbone + FPN neck for BEV maps (NHWC).

Rebuild of /root/reference/mmdet3d/models/backbones/second.py and
necks/second_fpn.py — plain conv stacks; XLA fuses these aggressively."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.models.layers import ConvNormAct


class SECOND(nn.Module):
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (c, n, s) in enumerate(
            zip(self.out_channels, self.layer_nums, self.layer_strides)
        ):
            x = ConvNormAct(c, 3, stride=s, dtype=self.dtype, name=f"down_{i}")(x, train)
            for j in range(n):
                x = ConvNormAct(c, 3, dtype=self.dtype, name=f"conv_{i}_{j}")(x, train)
            outs.append(x)
        return outs


class SECONDFPN(nn.Module):
    """Upsample each level and concat (second_fpn.py)."""

    out_channels: Sequence[int] = (384,)
    upsample_strides: Sequence[int] = (1,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        ups = []
        for i, (x, c, s) in enumerate(zip(feats, self.out_channels, self.upsample_strides)):
            if s > 1:
                x = nn.ConvTranspose(
                    c, (s, s), strides=(s, s), use_bias=False, dtype=self.dtype,
                    name=f"deblock_conv_{i}",
                )(x)
            else:
                x = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"deblock_conv_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, name=f"deblock_bn_{i}",
            )(x)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

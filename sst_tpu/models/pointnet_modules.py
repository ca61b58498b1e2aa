"""PointNet++ set-abstraction / feature-propagation modules + PAConv.

TPU rebuild of the reference's mmdet3d/ops/pointnet_modules/ and ops/paconv/:
  - point_sa_module.py:215 PointSAModuleMSG  (multi-scale grouping SA)
  - point_sa_module.py:293 PointSAModule     (single-scale special case)
  - point_fp_module.py:10  PointFPModule     (three_nn interpolation + MLP)
  - paconv/paconv.py:12    ScoreNet, :106 PAConv (weight-bank position-
    adaptive conv; the fused matmul path of paconv.py:247 — the separate
    PAConvCUDA assign_score_withk kernel is unnecessary on TPU because XLA
    fuses the score-weighted kernel assembly into the einsum).

Design: batched static shapes [B, N, ...] with optional validity masks
(the reference assumes exact-size clouds; padding rows here are pushed to
+inf distance so they are never grouped). Sampling uses ops/fps.py D-FPS;
grouping uses ops/pointnet.py ball_query / knn.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.ops.fps import furthest_point_sample
from sst_tpu.ops.pointnet import (ball_query, gather_points,
                                  grouping_operation, knn, query_and_group)


class _SharedMLP(nn.Module):
    """Stack of 1x1 conv + BN + ReLU over [B, C, N, K] (channel-first),
    mirroring ConvModule(Conv2d, BN2d, ReLU) chains in the reference."""

    channels: Sequence[int]
    last_act: bool = True
    last_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.moveaxis(x, 1, -1)  # [B, N, K, C] for flax Dense/BN
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            last = i == n - 1
            x = nn.Dense(c, use_bias=False, name=f"layer{i}")(x)
            if (not last) or self.last_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn{i}")(x)
            if (not last) or self.last_act:
                x = nn.relu(x)
        return jnp.moveaxis(x, -1, 1)


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (point_sa_module.py:215).

    Call: (points_xyz [B, N, 3], features [B, C, N] or None, valid [B, N])
    Returns (new_xyz [B, num_point, 3], new_features [B, sum(mlp[-1]), num_point],
             indices [B, num_point]).
    """

    num_point: int
    radii: Sequence[Optional[float]]
    sample_nums: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    use_xyz: bool = True
    pool_mod: str = "max"
    normalize_xyz: bool = False
    min_radii: Sequence[float] = ()
    grouper: str = "ball"  # 'ball' | 'knn'

    @nn.compact
    def __call__(self, points_xyz, features=None, valid=None,
                 target_xyz=None, train: bool = False):
        assert self.pool_mod in ("max", "avg")
        b, n, _ = points_xyz.shape
        if valid is None:
            valid = jnp.ones((b, n), bool)

        if target_xyz is not None:
            new_xyz = target_xyz
            indices = None
        else:
            # D-FPS per sample (point_sa_module.py:120 Points_Sampler D-FPS)
            indices, _ = jax.vmap(
                lambda p, v: furthest_point_sample(p, v, self.num_point)
            )(points_xyz, valid)
            new_xyz = jax.vmap(lambda p, i: p[i])(points_xyz, indices)

        outs = []
        for i, (radius, ns) in enumerate(zip(self.radii, self.sample_nums)):
            if self.grouper == "knn" or radius is None:
                idx = jnp.swapaxes(knn(ns, points_xyz, new_xyz, valid), 1, 2)
            else:
                lo = self.min_radii[i] if i < len(self.min_radii) else 0.0
                idx = ball_query(lo, radius, ns, points_xyz, new_xyz, valid)
            if self.use_xyz:
                grouped = query_and_group(
                    points_xyz, new_xyz, idx, features=features,
                    normalize_xyz=self.normalize_xyz, radius=radius)
            else:
                assert features is not None
                grouped = grouping_operation(features, idx)
            mlp_out = _SharedMLP(
                self.mlp_channels[i], name=f"mlp{i}")(grouped, train=train)
            if self.pool_mod == "max":
                outs.append(jnp.max(mlp_out, axis=-1))
            else:
                outs.append(jnp.mean(mlp_out, axis=-1))
        return new_xyz, jnp.concatenate(outs, axis=1), indices


class PointSAModule(PointSAModuleMSG):
    """Single-scale grouping special case (point_sa_module.py:293) — build
    with one-element radii/sample_nums/mlp_channels lists."""


class PointFPModule(nn.Module):
    """Feature propagation: inverse-distance three_nn interpolation + MLP
    (point_fp_module.py:40)."""

    mlp_channels: Sequence[int]

    @nn.compact
    def __call__(self, target, source, target_feats, source_feats,
                 source_valid=None, train: bool = False):
        from sst_tpu.ops.pointnet import three_interpolate, three_nn

        if source is not None:
            dist, idx = three_nn(target, source, source_valid)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / recip.sum(-1, keepdims=True)
            interp = three_interpolate(source_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                source_feats, source_feats.shape[:2] + (target.shape[1],))
        if target_feats is not None:
            new = jnp.concatenate([interp, target_feats], axis=1)
        else:
            new = interp
        out = _SharedMLP(self.mlp_channels)(new[..., None], train=train)
        return out[..., 0]


class ScoreNet(nn.Module):
    """MLP scoring point-pair geometry → per-kernel weights
    (paconv/paconv.py:12)."""

    mlp_channels: Sequence[int]
    score_norm: str = "softmax"
    temp_factor: float = 1.0
    last_bn: bool = False

    @nn.compact
    def __call__(self, xyz_features, train: bool = False):
        scores = _SharedMLP(
            self.mlp_channels, last_act=False, last_bn=self.last_bn
        )(xyz_features, train=train)  # [B, M, N, K]
        if self.score_norm == "softmax":
            scores = jax.nn.softmax(scores / self.temp_factor, axis=1)
        elif self.score_norm == "sigmoid":
            scores = jax.nn.sigmoid(scores / self.temp_factor)
        return jnp.transpose(scores, (0, 2, 3, 1))  # [B, N, K, M]


class PAConv(nn.Module):
    """Position-adaptive convolution (paconv/paconv.py:106).

    Call with (features [B, in_c, npoint, K], points_xyz [B, 3, npoint, K]);
    returns (new_features [B, out_c, npoint, K], points_xyz) so instances
    chain like the reference's nn.Sequential wrapping.
    """

    in_channels: int
    out_channels: int
    num_kernels: int
    scorenet_input: str = "w_neighbor_dist"
    kernel_input: str = "w_neighbor"
    scorenet_mid: Sequence[int] = (16, 16)
    score_norm: str = "softmax"

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        features, points_xyz = inputs
        kernel_mul = {"identity": 1, "w_neighbor": 2}[self.kernel_input]
        if self.kernel_input == "w_neighbor":
            center = features[..., :1]
            features = jnp.concatenate([features - center, features], axis=1)

        center_xyz = jnp.broadcast_to(points_xyz[..., :1], points_xyz.shape)
        diff = points_xyz - center_xyz
        if self.scorenet_input == "identity":
            xyz_feat, sc_in = diff, 3
        elif self.scorenet_input == "w_neighbor":
            xyz_feat, sc_in = jnp.concatenate([diff, points_xyz], 1), 6
        else:  # w_neighbor_dist (paconv.py:209)
            dist = jnp.linalg.norm(diff, axis=1, keepdims=True)
            xyz_feat = jnp.concatenate([center_xyz, diff, dist], 1)
            sc_in = 7

        scores = ScoreNet(
            (*self.scorenet_mid, self.num_kernels),
            score_norm=self.score_norm, name="scorenet",
        )(xyz_feat, train=train)  # [B, np, K, M]

        weight_bank = self.param(
            "weight_bank", nn.initializers.kaiming_normal(),
            (self.in_channels * kernel_mul,
             self.num_kernels * self.out_channels))
        w = weight_bank.reshape(
            self.in_channels * kernel_mul, self.num_kernels, self.out_channels)
        # fused matmul + score assembly (paconv.py:271 matmul + assign_score)
        new = jnp.einsum("bcnk,cmo,bnkm->bonk", features, w, scores)
        new = jnp.moveaxis(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(jnp.moveaxis(new, 1, -1)),
            -1, 1)
        return nn.relu(new), points_xyz

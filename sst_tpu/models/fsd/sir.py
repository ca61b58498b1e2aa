"""SIR — Sparse Instance Recognition backbone (cluster-wise PointNets).

TPU rebuild of /root/reference/mmdet3d/models/backbones/sir.py:16 and the
SIRLayer voxel encoder (models/voxel_encoders/voxel_encoder.py:618):
per-point MLP gated by a relative-position MLP, segment-max pooled per
cluster, pooled feature broadcast-concat between layers; the backbone
concatenates every block's cluster feature.

All segment ops run over a shared precomputed cluster assignment
(``unique_once=True`` semantics): seg_ids [N] → cluster slots [C]."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.models.layers import MLP
from sst_tpu.ops.segment import gather_segments, segment_reduce


class SIRLayer(nn.Module):
    """One SIR block: decorate → (rel-MLP gate) → VFE layers with
    pool+broadcast between them. Returns (point_feats, cluster_feats)."""

    feat_channels: Sequence[int] = (128, 128)
    rel_mlp_hidden: Sequence[int] = (16, 32)
    in_channels: int = 84  # xyz + feats dim fed in (for rel mlp out dim)
    with_rel_mlp: bool = True
    with_cluster_center: bool = False
    with_shortcut: bool = True
    mode: str = "max"
    xyz_normalizer: tuple = (20.0, 20.0, 4.0)
    rel_dist_scaler: float = 10.0
    norm: str = "ln"
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, f_cluster, seg_ids, num_clusters: int, valid,
                 train: bool = False):
        """feats: [N, 3+C] (xyz first); f_cluster: [N, 3] offsets to cluster
        center; seg_ids: [N] cluster slot per point."""
        normalizer = jnp.asarray(self.xyz_normalizer, jnp.float32)
        base = jnp.concatenate(
            [feats[:, :3] / normalizer[None], feats[:, 3:]], axis=-1
        )
        shortcut = feats[:, 3:]
        fc = f_cluster / self.rel_dist_scaler
        parts = [base]
        if self.with_cluster_center:
            parts.append(fc / 10.0)
        if self.with_rel_mlp:
            gate = MLP(
                tuple(self.rel_mlp_hidden) + (base.shape[-1],),
                act=self.act, norm=self.norm, dtype=self.dtype, name="rel_mlp",
            )(fc, valid, train)
            parts[0] = parts[0] * gate
        x = jnp.concatenate(parts, axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)

        n_layers = len(self.feat_channels)
        pooled_list = []
        for i, c in enumerate(self.feat_channels):
            x = MLP((c,), act=self.act, norm=self.norm, dtype=self.dtype,
                    name=f"vfe_{i}")(x, valid, train)
            x = jnp.where(valid[:, None], x, 0.0)
            pooled = segment_reduce(x, seg_ids, num_clusters, self.mode)
            pooled_list.append(pooled)
            if i != n_layers - 1:
                back = gather_segments(pooled, seg_ids)
                x = jnp.concatenate([x, back], axis=-1)
                x = jnp.where(valid[:, None], x, 0.0)
        point_feats = x
        # each VFE layer's pooled feature is kept (voxel_encoder.py:741-747)
        cluster_feats = jnp.concatenate(pooled_list, axis=-1)
        if self.with_shortcut and point_feats.shape == shortcut.shape:
            point_feats = point_feats + shortcut
        return point_feats, cluster_feats


class SIR(nn.Module):
    """Stack of SIRLayers; concatenates every block's cluster feature
    (sir.py:70-89)."""

    num_blocks: int = 3
    in_channels: Sequence[int] = (84, 133, 133)
    feat_channels: Sequence[Sequence[int]] = ((128, 128),) * 3
    rel_mlp_hidden: Sequence[Sequence[int]] = ((16, 32),) * 3
    mode: str = "max"
    xyz_normalizer: tuple = (20.0, 20.0, 4.0)
    norm: str = "ln"
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, feats, f_cluster, seg_ids, num_clusters: int,
                 valid, train: bool = False):
        """points: [N, 3+] raw point columns (xyz + intensity/elongation...)."""
        out_feats = feats
        cluster_list = []
        for i in range(self.num_blocks):
            x = jnp.concatenate([points, out_feats], axis=-1)
            out_feats, cfeat = SIRLayer(
                feat_channels=tuple(self.feat_channels[i]),
                rel_mlp_hidden=tuple(self.rel_mlp_hidden[i]),
                in_channels=self.in_channels[i],
                mode=self.mode, xyz_normalizer=self.xyz_normalizer,
                norm=self.norm, act=self.act, dtype=self.dtype,
                name=f"block_{i}",
            )(x, f_cluster, seg_ids, num_clusters, valid, train)
            cluster_list.append(cfeat)
        return out_feats, jnp.concatenate(cluster_list, axis=-1)

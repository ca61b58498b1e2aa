"""Voxel feature encoders (flax), operating on a :class:`VoxelMapping`.

TPU rebuild of /root/reference/mmdet3d/models/voxel_encoders/voxel_encoder.py:
  - DynamicVFE (:93)        — SST's encoder: cluster/voxel-center decoration,
    per-layer scatter-max + broadcast concat, final scatter reduce.
  - DynamicScatterVFE (:503) — FSD's encoder: same shape but uses the shared
    unique (``unique_once``) and no dense canvas; here both share one
    VoxelMapping so the distinction disappears.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sst_tpu.models.layers import MLP, MaskedBatchNorm
from sst_tpu.ops.segment import gather_segments, segment_reduce
from sst_tpu.ops.sorted_reduce import sorted_segment_reduce
from sst_tpu.ops.voxelize import VoxelMapping


def _decorate(points, valid, seg_ids, counts, coords, reduce_fn,
              point_cloud_range, voxel_size, with_cluster_center,
              with_voxel_center, with_distance, extra_sum=None):
    """Append cluster-center and voxel-center offsets to raw point features
    (voxel_encoder.py:255-283). Works in any consistent row order.

    ``extra_sum`` [N, E]: extra per-point channels whose per-voxel SUM the
    caller needs (e.g. FSDv2's virtual-point indicator) — they ride the
    cluster-center sum pass for free, because a scatter-reduce at these row
    counts is index-latency-bound (~2.7 ms whether 3 or 128 channels wide).
    Returns (decorated_points, aux) with aux['cluster_mean'] [V, 3] and
    aux['extra_sum'] [V, E] when requested."""
    feats = [points]
    xyz = points[:, :3]
    aux = {}
    if with_cluster_center or extra_sum is not None:
        # sum + divide by the voxelizer's counts: a "mean" reduce would
        # scatter a redundant count pass (~3 ms at 196k points — each
        # scatter-reduce is index-latency-bound)
        cols = xyz if extra_sum is None else jnp.concatenate(
            [xyz, jnp.where(valid[:, None], extra_sum, 0.0)], axis=-1)
        vox_sum = reduce_fn(cols, "sum")
        vox_mean = vox_sum[:, :3] / jnp.maximum(counts, 1).astype(
            vox_sum.dtype)[:, None]
        aux["cluster_mean"] = vox_mean
        if extra_sum is not None:
            aux["extra_sum"] = vox_sum[:, 3:]
        if with_cluster_center:
            cluster = xyz - gather_segments(vox_mean, seg_ids)
            feats.append(cluster)
    if with_voxel_center:
        vs = jnp.asarray(voxel_size, jnp.float32)
        pcr = jnp.asarray(point_cloud_range[:3], jnp.float32)
        centers = (coords[:, jnp.array([3, 2, 1])].astype(jnp.float32) + 0.5) * vs + pcr
        feats.append(xyz - centers)
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where(valid[:, None], out, 0.0), aux


def decorate_points(points, vm: VoxelMapping, point_cloud_range, voxel_size,
                    with_cluster_center=True, with_voxel_center=True,
                    with_distance=False):
    out, _ = _decorate(
        points, vm.valid, vm.point_seg_ids, vm.unique.counts, vm.coords,
        lambda x, mode: segment_reduce(x, vm.point_seg_ids,
                                       vm.num_voxel_slots, mode),
        point_cloud_range, voxel_size, with_cluster_center, with_voxel_center,
        with_distance)
    return out


class DynamicVFELayer(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype)(x)
        x = MaskedBatchNorm(dtype=self.dtype)(x, mask, train)
        return nn.relu(x)


class HardSimpleVFE(nn.Module):
    """Mean of in-voxel points (voxel_encoder.py:19) over hard-voxelized
    [V, T, C] tensors."""

    @nn.compact
    def __call__(self, voxels, num_points):
        t = voxels.shape[1]
        mask = jnp.arange(t)[None, :] < num_points[:, None]
        s = jnp.sum(voxels * mask[..., None], axis=1)
        return s / jnp.maximum(num_points, 1)[:, None]


class PillarFeatureNet(nn.Module):
    """PointPillars PFN over hard voxels (pillar_encoder.py:12): per-point
    decorations (cluster offset, pillar-center offset, range) → PFN layers
    (linear+BN+relu, max-pool over the pillar, broadcast-concat)."""

    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: tuple = (0.32, 0.32, 6.0)
    point_cloud_range: tuple = (-74.88, -74.88, -2, 74.88, 74.88, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = False):
        v, t, c = voxels.shape
        mask = (jnp.arange(t)[None, :] < num_points[:, None])[..., None]
        xyz = voxels[..., :3]
        mean = jnp.sum(xyz * mask, axis=1) / jnp.maximum(num_points, 1)[:, None]
        cluster = (xyz - mean[:, None]) * mask
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        centers = (coords[:, jnp.array([3, 2, 1])].astype(jnp.float32) + 0.5) * vs + pcr
        center_off = (xyz - centers[:, None]) * mask
        feats = [voxels, cluster, center_off]
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True) * mask)
        x = jnp.concatenate(feats, axis=-1).astype(self.dtype)
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype,
                         name=f"pfn_{i}")(x)
            x = MaskedBatchNorm(dtype=self.dtype, name=f"pfn_bn_{i}")(
                x.reshape(v * t, ch), mask.reshape(v * t), train
            ).reshape(v, t, ch)
            x = nn.relu(x) * mask
            pooled = x.max(axis=1)
            if i != len(self.feat_channels) - 1:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(pooled[:, None], x.shape)], axis=-1
                ) * mask
        return pooled


class DynamicVFE(nn.Module):
    """Point→voxel encoder. Returns voxel features [V, C_out].

    Reductions default to XLA scatters (ops/segment.py). With
    ``use_sorted_reduce=True`` and a sort-based unique pass
    (``unique.order`` present), the per-layer reductions instead run as one
    streaming Pallas pass over rows pre-gathered into voxel order
    (ops/sorted_reduce.py) — an opt-in for scatter-dominated regimes; at
    flagship shapes the scatter build measured faster end-to-end
    (see _sorted_path).
    """

    feat_channels: Sequence[int] = (64, 128)
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_distance: bool = False
    voxel_size: tuple = (0.32, 0.32, 6.0)
    point_cloud_range: tuple = (-74.88, -74.88, -2, 74.88, 74.88, 4)
    mode: str = "max"
    return_point_feats: bool = False
    # None = default off (see _sorted_path: the scatter build measured
    # faster end-to-end on v5e at flagship shapes). True opts into the
    # Pallas sorted reduce — works single-device and inside the shard_map
    # train step (pallas_call cannot be auto-partitioned by pjit).
    use_sorted_reduce: bool | None = None
    dtype: jnp.dtype = jnp.float32

    def _sorted_path(self, vm: VoxelMapping) -> bool:
        import os

        if self.return_point_feats or vm.unique.order is None:
            return False
        if self.mode not in ("max", "mean", "sum"):
            return False
        if os.environ.get("SST_TPU_NO_SORTED_REDUCE"):
            return False
        if self.use_sorted_reduce is not None:
            return self.use_sorted_reduce
        # OFF by default: hardware-validated A/B (r04, flagship FSDv2-dense,
        # real v5e) measured the sorted-Pallas build at 94.5 ms/frame vs
        # 73.5 ms for the scatter build — at flagship shapes XLA's scatter
        # costs only ~1-3 ms while the sorted path pays ~9 ms of extra sort
        # plus per-call row-gather/lane-packing. The kernel stays available
        # (config key use_sorted_reduce=True / env below) for regimes where
        # scatters dominate, and bench.py's preflight keeps it compiling+
        # numerically validated on hardware every round.
        return bool(os.environ.get("SST_TPU_FORCE_SORTED_REDUCE")
                    or os.environ.get("SST_TPU_PALLAS_INTERPRET"))

    @nn.compact
    def __call__(self, points, vm: VoxelMapping, train: bool = False,
                 extra_sum=None):
        """``extra_sum`` [N, E]: extra channels summed per voxel on the
        cluster-center pass (see _decorate); when given, returns
        (voxel_feats, aux) with aux['cluster_mean'] / aux['extra_sum']."""
        num_vox = vm.num_voxel_slots
        if self._sorted_path(vm):
            order = vm.unique.order
            points = points[order]
            valid = vm.valid[order]
            seg = vm.point_seg_ids[order]
            coords = vm.coords[order]
            if extra_sum is not None:
                extra_sum = extra_sum[order]

            def reduce_fn(x, mode):
                if mode == "mean":
                    s = sorted_segment_reduce(x, seg, num_vox, "sum")
                    return s / jnp.maximum(vm.unique.counts, 1).astype(
                        s.dtype)[:, None]
                return sorted_segment_reduce(x, seg, num_vox, mode)
        else:
            valid, seg, coords = vm.valid, vm.point_seg_ids, vm.coords

            def reduce_fn(x, mode):
                return segment_reduce(x, seg, num_vox, mode)

        x, aux = _decorate(
            points, valid, seg, vm.unique.counts, coords, reduce_fn,
            self.point_cloud_range, self.voxel_size,
            self.with_cluster_center, self.with_voxel_center,
            self.with_distance, extra_sum=extra_sum,
        )
        x = x.astype(self.dtype)
        n_layers = len(self.feat_channels)
        point_feats = x
        for i, c in enumerate(self.feat_channels):
            point_feats = DynamicVFELayer(c, dtype=self.dtype)(point_feats, valid, train)
            voxel_feats = reduce_fn(point_feats, self.mode)
            if i != n_layers - 1:
                back = gather_segments(voxel_feats, seg)
                point_feats = jnp.concatenate([point_feats, back], axis=-1)
                point_feats = jnp.where(valid[:, None], point_feats, 0.0)
        if self.return_point_feats:
            # honor the documented (out, aux) contract in this branch too:
            # dropping aux silently would hand a combined caller wrong data
            if extra_sum is not None:
                return point_feats, aux
            return point_feats
        out = jnp.where(vm.voxel_valid[:, None], voxel_feats, 0.0)
        if extra_sum is not None:
            return out, aux
        return out


class DynamicPillarFeatureNet(DynamicVFE):
    """Dynamic (scatter-based) PillarFeatureNet — reference
    pillar_encoder.py:121 DynamicPillarFeatureNet. Identical computation to
    DynamicVFE over full-height pillars: per-point decoration with cluster
    and pillar-center offsets, PFN layers, segment max-pool. Configure
    ``voxel_size`` with a z extent covering the full point-cloud range so
    the grid degenerates to pillars."""

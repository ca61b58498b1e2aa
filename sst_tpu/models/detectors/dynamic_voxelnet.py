"""DynamicVoxelNet — the SST detector.

Rebuild of /root/reference/mmdet3d/models/detectors/dynamic_voxelnet.py:11:
dynamic voxelize → DynamicVFE → SST input layer → SSTv2 backbone →
SECONDFPN neck → Anchor3DHead. One jittable apply for train loss and one for
inference.

Static-shape capacities (points/voxels/windows) live in the config; see
SURVEY.md §7.1 on bucketing discipline.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.models.heads.anchor3d import Anchor3DHead
from sst_tpu.models.second import SECONDFPN
from sst_tpu.models.sst import SSTv2
from sst_tpu.models.sst_input import sst_input_layer
from sst_tpu.models.vfe import DynamicVFE
from sst_tpu.ops.voxelize import dynamic_voxelize, grid_shape_zyx
from sst_tpu.ops.window import BucketSpec


@struct.dataclass
class PointBatch:
    """Host-assembled, padded input batch.

    points: [B, P, C] (xyz + extra channels); valid: [B, P] bool;
    gt_boxes: [B, G, 7+]; gt_labels: [B, G]; gt_valid: [B, G].
    """

    points: jax.Array
    valid: jax.Array
    gt_boxes: jax.Array | None = None
    gt_labels: jax.Array | None = None
    gt_valid: jax.Array | None = None


class DynamicVoxelNet(nn.Module):
    voxel_size: tuple = (0.32, 0.32, 6.0)
    point_cloud_range: tuple = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    max_voxels: int = 32768
    max_total_windows: int = 8192
    window_shape: tuple = (12, 12)
    buckets: tuple = (
        BucketSpec(30, 0, 30, 2048),
        BucketSpec(60, 30, 60, 512),
        BucketSpec(100, 60, 100000, 256),
    )
    vfe: dict = struct.field(default_factory=dict)
    backbone: dict = struct.field(default_factory=dict)
    neck: dict = struct.field(default_factory=dict)
    head: dict = struct.field(default_factory=dict)
    head_type: str = "anchor"  # 'anchor' (Anchor3DHead) | 'center' (CenterHead)
    backbone_type: str = "sstv2"  # 'sstv2' | 'sstv1' (v1 conv defaults)
    shuffle_voxels: bool = True
    test_cfg: dict = struct.field(
        default_factory=lambda: dict(
            score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
            use_rotate_nms=True,
        )
    )
    dtype: Any = jnp.float32

    @property
    def bev_shape(self):
        nz, ny, nx = grid_shape_zyx(self.point_cloud_range, self.voxel_size)
        return (ny, nx)

    def setup(self):
        self.vfe_mod = DynamicVFE(
            voxel_size=self.voxel_size, point_cloud_range=self.point_cloud_range,
            dtype=self.dtype, **self.vfe,
        )
        bb = dict(output_shape=self.bev_shape)
        bb.update(self.backbone)
        if self.backbone_type == "sstv1":
            from sst_tpu.models.sst import SSTv1

            self.backbone_mod = SSTv1(dtype=self.dtype, **bb)
        else:
            self.backbone_mod = SSTv2(dtype=self.dtype, **bb)
        self.neck_mod = SECONDFPN(dtype=self.dtype, **self.neck)
        if self.head_type == "center":
            from sst_tpu.models.heads.center_head import CenterHead

            self.head_mod = CenterHead(
                point_cloud_range=self.point_cloud_range,
                voxel_size=self.voxel_size, dtype=self.dtype, **self.head,
            )
        else:
            self.head_mod = Anchor3DHead(dtype=self.dtype, **self.head)

    def extract_feat(self, batch: PointBatch, train: bool, diag: dict | None = None):
        """diag, if given, is filled with capacity-overflow observables:
        static caps (max_voxels, window caps) silently drop work when
        exceeded, so training logs must surface the drop counts."""
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        vm = dynamic_voxelize(
            pts, batch_idx, batch.valid.reshape(-1),
            self.point_cloud_range, self.voxel_size, self.max_voxels, b,
        )
        voxel_feats = self.vfe_mod(pts, vm, train)
        d_model = self.backbone_mod.d_model[0]
        rng = None
        if train and self.shuffle_voxels and self.has_rng("shuffle"):
            rng = self.make_rng("shuffle")
        ny, nx = self.bev_shape
        plan = sst_input_layer(
            vm.voxel_coords, vm.voxel_valid,
            sparse_shape=(nx, ny, 1),
            window_shape=self.window_shape,
            buckets=self.buckets,
            d_model=d_model,
            max_total_windows=self.max_total_windows,
            shuffle_rng=rng,
        )
        bev, _ = self.backbone_mod(voxel_feats, vm.voxel_coords, plan, b, train)
        feats = self.neck_mod(bev, train)
        if diag is not None:
            f32 = jnp.float32
            diag["num_voxels"] = vm.voxel_valid.sum().astype(f32)
            # points whose voxel fell past the max_voxels cap (dropped)
            diag["num_voxel_overflow_points"] = (
                vm.valid & (vm.unique.seg_ids >= self.max_voxels)
            ).sum().astype(f32)
            # The reference's drop buckets INTENTIONALLY trim voxels (rank
            # beyond the bucket's max_tokens seats / count outside every
            # drop range) — expected nonzero on dense frames. Only the
            # remainder is a static window-capacity overflow and must be 0.
            total_win_lost = (vm.voxel_valid & ~plan.valid).sum().astype(f32)
            seat = plan.num_seat_trimmed.astype(f32)
            diag["num_window_seat_trimmed_voxels"] = seat
            diag["num_window_dropped_voxels"] = total_win_lost - seat
        return feats

    def __call__(self, batch: PointBatch, train: bool = False, diag: dict | None = None):
        feats = self.extract_feat(batch, train, diag)
        return self.head_mod(feats, train)

    def loss(self, batch: PointBatch, train: bool = True):
        diag: dict = {}
        preds = self(batch, train, diag)
        if self.head_type == "center":
            losses = self.head_mod.loss(
                preds, batch.gt_boxes, batch.gt_labels, batch.gt_valid
            )
        else:
            h, w = preds["cls"].shape[1:3]
            anchors = self.head_mod.grid_anchors((h, w))
            losses = self.head_mod.loss(
                preds, anchors, batch.gt_boxes, batch.gt_labels, batch.gt_valid
            )
        losses.update(diag)
        return losses

    def predict(self, batch: PointBatch):
        preds = self(batch, train=False)
        if self.head_type == "center":
            return self.head_mod.get_bboxes(preds, **self.test_cfg)
        h, w = preds["cls"].shape[1:3]
        anchors = self.head_mod.grid_anchors((h, w))
        return self.head_mod.get_bboxes(preds, anchors, **self.test_cfg)

"""PointPillars / SECOND-style dense-BEV detector.

TPU rebuild of the reference's legacy `VoxelNet` detector family
(mmdet3d/models/detectors/voxelnet.py — the classic PointPillars / SECOND
baselines inherited from mmdet3d, SURVEY §2.11 "parity-optional"): hard
voxelization → PillarFeatureNet (or HardSimpleVFE) → PointPillarsScatter
(or SparseEncoder) → SECOND backbone → SECONDFPN → Anchor3DHead.

Every stage already exists in this repo; this class is the wiring plus the
same loss/predict scaffolding as DynamicVoxelNet, so the classic baselines
are one config away rather than a missing family.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.models.detectors.dynamic_voxelnet import PointBatch
from sst_tpu.models.heads.anchor3d import Anchor3DHead
from sst_tpu.models.second import SECOND, SECONDFPN
from sst_tpu.models.vfe import HardSimpleVFE, PillarFeatureNet
from sst_tpu.ops.voxelize import grid_shape_zyx, hard_voxelize
from sst_tpu.utils.registry import MODELS


@MODELS.register
class PointPillars(nn.Module):
    """Hard-voxel pillar detector (VoxelNet scaffold, PointPillars config)."""

    voxel_size: tuple = (0.32, 0.32, 6.0)
    point_cloud_range: tuple = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    max_voxels: int = 32000
    max_points_per_voxel: int = 20
    vfe_type: str = "pillar"  # 'pillar' (PillarFeatureNet) | 'simple' (mean)
    vfe: dict = struct.field(default_factory=dict)
    backbone: dict = struct.field(default_factory=dict)
    neck: dict = struct.field(default_factory=dict)
    head: dict = struct.field(default_factory=dict)
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
        if self.vfe_type == "pillar":
            self.vfe_mod = PillarFeatureNet(
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                dtype=self.dtype, **self.vfe,
            )
        else:
            self.vfe_mod = HardSimpleVFE()
        self.backbone_mod = SECOND(dtype=self.dtype, **self.backbone)
        self.neck_mod = SECONDFPN(dtype=self.dtype, **self.neck)
        self.head_mod = Anchor3DHead(dtype=self.dtype, **self.head)

    def extract_feat(self, batch: PointBatch, train: bool,
                     diag: dict | None = None):
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        voxels, num_points, coords, vox_valid = hard_voxelize(
            pts, batch_idx, batch.valid.reshape(-1),
            self.point_cloud_range, self.voxel_size,
            self.max_voxels, self.max_points_per_voxel, b,
        )
        if self.vfe_type == "pillar":
            pillar_feats = self.vfe_mod(voxels, num_points, coords, train)
        else:
            pillar_feats = self.vfe_mod(voxels, num_points)
        # pillar→BEV canvas scatter (PointPillarsScatter semantics,
        # pillar_scatter.py:9) — parameterless, so inlined rather than a
        # submodule (flax setup-mode restriction)
        ny, nx = self.bev_shape
        idx = (coords[:, 0] * ny + coords[:, 2]) * nx + coords[:, 3]
        idx = jnp.where(vox_valid, idx, b * ny * nx)
        canvas = jnp.zeros((b * ny * nx + 1, pillar_feats.shape[-1]),
                           pillar_feats.dtype)
        canvas = canvas.at[idx].set(
            jnp.where(vox_valid[:, None], pillar_feats, 0.0), mode="drop")
        canvas = canvas[:-1].reshape(b, ny, nx, pillar_feats.shape[-1])
        feats = self.neck_mod(self.backbone_mod(canvas, train), train)
        if diag is not None:
            diag["num_voxels"] = vox_valid.sum().astype(jnp.float32)
        return feats

    def __call__(self, batch: PointBatch, train: bool = False,
                 diag: dict | None = None):
        return self.head_mod(self.extract_feat(batch, train, diag), train)

    def loss(self, batch: PointBatch, train: bool = True):
        diag: dict = {}
        preds = self(batch, train, diag)
        h, w = preds["cls"].shape[1:3]
        anchors = self.head_mod.grid_anchors((h, w))
        losses = self.head_mod.loss(
            preds, anchors, batch.gt_boxes, batch.gt_labels, batch.gt_valid
        )
        losses.update(diag)
        return losses

    def predict(self, batch: PointBatch):
        preds = self(batch, train=False)
        h, w = preds["cls"].shape[1:3]
        anchors = self.head_mod.grid_anchors((h, w))
        return self.head_mod.get_bboxes(preds, anchors, **self.test_cfg)

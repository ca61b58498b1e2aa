"""CTRL — offline track-centric auto-labeling (ICCV 2023).

TPU rebuild of /root/reference/mmdet3d/models/detectors/tracklet_detector.py
(:24 TrackletSegmentor, :194 TrackletDetector, :458 TimestampEncoder) and
roi_heads/tracklet_roi_head.py:16 (TrackletRoIHead).

A batch element is one *tracklet*: the multi-frame point cloud around one
track (pose-aligned host-side), the tracker's per-frame boxes, and (train)
one-to-one gt candidate boxes per frame. The segmentor is a pure feature
extractor (UNet over the whole track cloud + timestamp channel); the RoI
head refines every frame's box with SIR² over that frame's in-box points.

TPU trick: frame-paired point pooling (TrackletPointRoIExtractor,
dynamic_point_roi_extractor.py:147) is the ordinary capped in-box pairing
with composite group ids (tracklet * F + frame) — no new kernel needed.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from sst_tpu.core import losses as L
from sst_tpu.core.box_coders import delta_encode
from sst_tpu.core.boxes import corners
from sst_tpu.core.iou import boxes_iou_3d
from sst_tpu.models.fsd.roi_head import (
    FullySparseBboxHead,
    canonical_gt,
    decode_rcnn,
    dynamic_point_pool,
)
from sst_tpu.models.sparse_unet import SimpleSparseUNet, build_unet_plan
from sst_tpu.models.vfe import DynamicVFE
from sst_tpu.ops.segment import gather_segments
from sst_tpu.ops.sparse_conv import SparseGrid
from sst_tpu.ops.voxelize import dynamic_voxelize, grid_shape_zyx


@struct.dataclass
class TrackletBatch:
    """B tracklets, each with P points over F frames (track-frame coords)."""

    points: jax.Array  # [B, P, C] (last channel = per-point timestamp lag)
    valid: jax.Array  # [B, P]
    frame_inds: jax.Array  # [B, P] int32 in [0, F)
    trk_boxes: jax.Array  # [B, F, 7] tracker boxes per frame
    trk_scores: jax.Array  # [B, F]
    trk_valid: jax.Array  # [B, F]
    labels: jax.Array  # [B] track class
    gt_boxes: jax.Array  # [B, F, 7] one-to-one gt candidate per frame
    gt_valid: jax.Array  # [B, F]


class TrackletSegmentor(nn.Module):
    """Feature extractor over the whole tracklet cloud
    (tracklet_detector.py:24): tanh intensity hack → timestamp channel
    (TimestampEncoder 'scalar' strategy :458-480) → dynamic voxelize →
    DynamicScatterVFE → SimpleSparseUNet → per-point gather + local xyz."""

    point_cloud_range: tuple = (-3.2, -3.2, -4.0, 3.2, 3.2, 4.0)
    voxel_size: tuple = (0.1, 0.1, 0.2)
    max_voxels: int = 8192
    unet_level_caps: tuple = (8192, 4096, 2048)
    unet_strides: tuple = ((2, 2, 2),) * 2
    unet_paddings: tuple = ((1, 1, 1),) * 2
    ts_normalizer: float = 1.0
    vfe: dict = struct.field(
        default_factory=lambda: dict(feat_channels=(64, 64), mode="max")
    )
    unet: dict = struct.field(default_factory=dict)
    dtype: Any = jnp.float32

    def setup(self):
        self.vfe_mod = DynamicVFE(
            voxel_size=self.voxel_size, point_cloud_range=self.point_cloud_range,
            dtype=self.dtype, **self.vfe,
        )
        self.unet_mod = SimpleSparseUNet(dtype=self.dtype, **self.unet)

    def __call__(self, points, batch_idx, points_valid, batch_size: int,
                 train: bool = False):
        pts = jnp.concatenate(
            [points[:, :3], jnp.tanh(points[:, 3:-1]),
             points[:, -1:] / self.ts_normalizer], axis=-1,
        )
        vm = dynamic_voxelize(
            pts, batch_idx, points_valid, self.point_cloud_range,
            self.voxel_size, self.max_voxels, batch_size,
        )
        voxel_feats = self.vfe_mod(pts, vm, train)
        grid = grid_shape_zyx(self.point_cloud_range, self.voxel_size)
        sg = SparseGrid(
            keys=jnp.where(vm.voxel_valid, vm.unique.unique_keys,
                           jnp.iinfo(jnp.int32).max),
            coords=vm.voxel_coords, valid=vm.voxel_valid, grid=grid,
            batch_size=batch_size,
        )
        plan = build_unet_plan(
            sg, (self.max_voxels,) + tuple(self.unet_level_caps[1:]),
            self.unet_strides, self.unet_paddings,
        )
        out = self.unet_mod(voxel_feats, plan, train)
        pt_feats = gather_segments(out["voxel_feats"], vm.point_seg_ids)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        centers = (vm.coords[:, jnp.array([3, 2, 1])].astype(jnp.float32) + 0.5) * vs + pcr
        local = jnp.where(vm.valid[:, None], pts[:, :3] - centers, 0.0)
        feats = jnp.concatenate([pt_feats, local], axis=-1)
        return {"seg_points": pts, "seg_feats": feats, "valid": vm.valid}


class TrackletRoIHead(nn.Module):
    """Per-frame RoI refinement over the track (tracklet_roi_head.py:16):
    rois = tracker boxes; assignment is the one-to-one gt candidate
    (TrackletAssigner, core/bbox/assigners/tracklet_assigner.py:7)."""

    num_classes: int = 1
    extra_wlh: tuple = (0.5, 0.5, 0.5)
    max_inbox_point: int = 96
    # candidate buffer for points inside ≥1 roi (pairing is uncapped per
    # point); drops surface as losses['roi_membership_overflow'] (see
    # models/fsd/roi_head.py dynamic_point_pool)
    max_paired_points: int = 32768
    cls_pos_thr: float = 0.8
    cls_neg_thr: float = 0.2
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 2.0
    corner_loss_weight: float = 1.0
    bbox_head: dict = None
    dtype: Any = jnp.float32

    def setup(self):
        self.bbox_head_mod = FullySparseBboxHead(
            num_classes=self.num_classes, dtype=self.dtype,
            **(self.bbox_head or {}),
        )

    def pool_and_forward(self, pts_xyz, pts_feats, pts_valid, pts_group,
                         rois, roi_valid, roi_group, train: bool):
        pool = dynamic_point_pool(
            pts_xyz[:, :3], pts_valid, pts_group, rois, roi_valid, roi_group,
            self.extra_wlh, self.max_inbox_point, self.max_paired_points,
        )
        r, k = pool["idx"].shape
        flat_idx = pool["idx"].reshape(-1)
        pair_valid = pool["valid"].reshape(-1)
        pair_pts = jnp.where(pair_valid[:, None], pts_xyz[flat_idx], 0.0)
        pair_feats = jnp.where(pair_valid[:, None], pts_feats[flat_idx], 0.0)
        return self.bbox_head_mod(
            pair_pts, pair_feats, pool["geo"].reshape(-1, 13), pair_valid, r,
            train,
        ) + (pool["membership_overflow"],)

    def _flatten(self, batch: TrackletBatch):
        b, f, _ = batch.trk_boxes.shape
        p = batch.points.shape[1]
        pts = batch.points.reshape(b * p, -1)
        # composite (tracklet, frame) group id pairs points with same-frame rois
        pt_group = (
            jnp.repeat(jnp.arange(b, dtype=jnp.int32), p) * f
            + batch.frame_inds.reshape(-1)
        )
        rois = batch.trk_boxes.reshape(b * f, 7)
        roi_group = jnp.arange(b * f, dtype=jnp.int32)
        return pts, pt_group, rois, roi_group

    def loss(self, batch: TrackletBatch, pts_feats, seg_valid,
             train: bool = True):
        b, f, _ = batch.trk_boxes.shape
        pts, pt_group, rois, roi_group = self._flatten(batch)
        roi_valid = batch.trk_valid.reshape(-1)
        cls_score, bbox_pred, nonempty, mem_overflow = self.pool_and_forward(
            pts, pts_feats, batch.valid.reshape(-1) & seg_valid, pt_group,
            rois, roi_valid, roi_group, train,
        )
        gts = batch.gt_boxes.reshape(b * f, 7)
        gv = batch.gt_valid.reshape(-1) & roi_valid
        # sanitize padded slots: zero-dim boxes make delta_encode's log NaN,
        # which poisons the masked loss (0 * nan = nan)
        unit = jnp.asarray([0, 0, 0, 1, 1, 1, 0], jnp.float32)
        rois = jnp.where(roi_valid[:, None], rois, unit[None])
        gts = jnp.where(gv[:, None], gts, rois)
        iou = jax.vmap(
            lambda r, g: boxes_iou_3d(r[None, :7], g[None, :7])[0, 0]
        )(rois, gts)
        iou = jnp.where(gv, iou, 0.0)
        soft = jnp.clip(
            (iou - self.cls_neg_thr) / (self.cls_pos_thr - self.cls_neg_thr),
            0.0, 1.0,
        )
        lw = (roi_valid & nonempty).astype(jnp.float32)
        loss_cls = L.binary_cross_entropy_loss(
            cls_score, soft, weight=lw, avg_factor=jnp.maximum(lw.sum(), 1.0)
        ) * self.loss_cls_weight

        ct = canonical_gt(rois, gts)
        anchors = rois.at[:, :3].set(0.0).at[:, 6].set(0.0)
        targets = delta_encode(anchors, ct)
        rw = (gv & nonempty).astype(jnp.float32)
        loss_bbox = L.l1_loss(
            bbox_pred, targets, weight=rw, avg_factor=jnp.maximum(rw.sum(), 1.0)
        ) * self.loss_bbox_weight

        decoded = decode_rcnn(rois, bbox_pred)
        cd = jnp.minimum(
            jnp.linalg.norm(corners(decoded) - corners(gts), axis=-1),
            jnp.linalg.norm(
                corners(decoded) - corners(gts.at[:, 6].add(np.pi)), axis=-1
            ),
        )
        huber = jnp.where(cd < 1.0, 0.5 * cd ** 2, cd - 0.5).mean(-1)
        loss_corner = (
            jnp.sum(huber * rw) / jnp.maximum(rw.sum(), 1.0)
            * self.corner_loss_weight
        )
        return {
            "loss_trk_cls": loss_cls,
            "loss_trk_bbox": loss_bbox,
            "loss_trk_corner": loss_corner,
            "mean_roi_iou": jnp.sum(iou * rw) / jnp.maximum(rw.sum(), 1.0),
            "roi_membership_overflow": mem_overflow.astype(jnp.float32),
        }

    def predict(self, batch: TrackletBatch, pts_feats, seg_valid):
        """Refined per-frame boxes + scores for every tracklet
        (get_bboxes_from_tracklet, fsd_bbox_head.py:792)."""
        b, f, _ = batch.trk_boxes.shape
        pts, pt_group, rois, roi_group = self._flatten(batch)
        roi_valid = batch.trk_valid.reshape(-1)
        cls_score, bbox_pred, nonempty, _ = self.pool_and_forward(
            pts, pts_feats, batch.valid.reshape(-1) & seg_valid, pt_group,
            rois, roi_valid, roi_group, False,
        )
        decoded = decode_rcnn(rois, bbox_pred)
        # empty rois keep the tracker box (reference valid_roi_mask handling)
        decoded = jnp.where(nonempty[:, None], decoded, rois)
        scores = jax.nn.sigmoid(cls_score) * nonempty
        return {
            "boxes": decoded.reshape(b, f, 7),
            "scores": scores.reshape(b, f),
            "valid": (roi_valid & nonempty).reshape(b, f),
            "labels": jnp.broadcast_to(batch.labels[:, None], (b, f)),
        }


class TrackletDetector(nn.Module):
    """segmentor → TrackletRoIHead (tracklet_detector.py:194)."""

    segmentor: dict = struct.field(default_factory=dict)
    roi_head: dict = struct.field(default_factory=dict)
    dtype: Any = jnp.float32

    def setup(self):
        self.segmentor_mod = TrackletSegmentor(dtype=self.dtype,
                                               **self.segmentor)
        self.roi_mod = TrackletRoIHead(dtype=self.dtype, **self.roi_head)

    def _seg(self, batch: TrackletBatch, train: bool):
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        return self.segmentor_mod(
            pts, batch_idx, batch.valid.reshape(-1), b, train
        )

    def loss(self, batch: TrackletBatch, train: bool = True):
        seg = self._seg(batch, train)
        return self.roi_mod.loss(batch, seg["seg_feats"], seg["valid"], train)

    def predict(self, batch: TrackletBatch):
        seg = self._seg(batch, False)
        return self.roi_mod.predict(batch, seg["seg_feats"], seg["valid"])

    def __call__(self, batch: TrackletBatch, train: bool = False):
        seg = self._seg(batch, train)
        return self.roi_mod.loss(batch, seg["seg_feats"], seg["valid"], train)

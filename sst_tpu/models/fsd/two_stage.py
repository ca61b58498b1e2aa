"""FSD — the full two-stage fully-sparse detector.

TPU rebuild of /root/reference/mmdet3d/models/detectors/two_stage_fsd.py:8:
SingleStageFSD as RPN (as_rpn semantics) + GroupCorrectionHead refinement.

Proposal generation for the RoI stage keeps the reference's training recipe
(top proposals by cluster score, no NMS at train — train_cfg.rpn nms_pre=-1)
with a static per-sample roi cap; the RoI point set is the pre-voxelized
cloud with SIR point features scattered back onto it
(prepare_multi_class_roi_input, two_stage_fsd.py:126-178).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.core.box_coders import base_point_decode
from sst_tpu.models.fsd.roi_head import GroupCorrectionHead
from sst_tpu.models.fsd.single_stage import SingleStageFSD
from sst_tpu.ops.ccl import topk_compact


class FSD(nn.Module):
    single_stage: dict = struct.field(default_factory=dict)
    roi_head: dict = struct.field(default_factory=dict)
    rois_per_sample: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.rpn = SingleStageFSD(dtype=self.dtype, **self.single_stage)
        self.roi = GroupCorrectionHead(
            num_classes=self.rpn.num_classes, dtype=self.dtype, **self.roi_head
        )

    def _proposals(self, pipe):
        """Per-sample top-k decoded cluster boxes across tasks → flat rois."""
        ex = pipe["ex"]
        outs = pipe["outs"]
        head = self.rpn.head_mod
        b = pipe["batch_size"]
        boxes_l, scores_l, labels_l, valid_l = [], [], [], []
        for t, names in enumerate(head.tasks):
            ids = head._task_class_ids(t)
            scores = jax.nn.sigmoid(outs["cls_logits"][t])
            dec = base_point_decode(ex["cluster_xyz"], outs["reg_preds"][t],
                                    head.bbox_coder_scale)
            best = scores.max(axis=-1)
            local = scores.argmax(axis=-1)
            lbl = jnp.asarray(ids, jnp.int32)[local]
            boxes_l.append(dec)
            scores_l.append(best)
            labels_l.append(lbl)
            valid_l.append(ex["cluster_valid"])
        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        labels = jnp.concatenate(labels_l)
        valid = jnp.concatenate(valid_l)
        batch = jnp.concatenate([ex["cluster_batch"]] * len(head.tasks))

        roi_boxes, roi_scores, roi_labels, roi_valid, roi_batch = [], [], [], [], []
        for i in range(b):
            m = valid & (batch == i)
            idx, sv = topk_compact(scores, m, self.rois_per_sample)
            roi_boxes.append(boxes[idx])
            roi_scores.append(jnp.where(sv, scores[idx], 0.0))
            roi_labels.append(labels[idx])
            roi_valid.append(sv)
            roi_batch.append(jnp.full((self.rois_per_sample,), i, jnp.int32))
        return (
            jnp.concatenate(roi_boxes),
            jnp.concatenate(roi_scores),
            jnp.concatenate(roi_labels),
            jnp.concatenate(roi_valid),
            jnp.concatenate(roi_batch),
        )

    def _roi_points(self, pipe):
        """RoI point set: pre-voxelized points + (SIR point feats ⊕ seg feats)."""
        data = pipe["data"]
        ex = pipe["ex"]
        pv = data["seg_points"].shape[0]
        c_sir = ex["pt_feats"].shape[-1]
        sir_feats = jnp.zeros((pv + 1, c_sir), ex["pt_feats"].dtype)
        # ex["points"] rows were gathered from data rows via per-class idx;
        # scatter SIR point features back (last class wins on overlap).
        idx = jnp.where(ex["pt_valid"], ex["pt_idx"], pv)
        sir_feats = sir_feats.at[idx].set(
            jnp.where(ex["pt_valid"][:, None], ex["pt_feats"], 0.0), mode="drop"
        )[:pv]
        seg_feat_dim = data["seg_feats"].shape[-1]
        feats = jnp.concatenate([sir_feats, data["seg_feats"]], axis=-1)
        return data["seg_points"], feats, data["valid"], data["batch_idx"]

    def loss(self, batch, train: bool = True, thr_extra: float = 0.0,
             pretrain: bool = False):
        if pretrain:
            # segmentation-only warmup (EnableFSDDetectionHook before
            # enable_after, fsd_hooks.py:70): no clustering / head / RoI
            return self.rpn.loss(batch, train, thr_extra, pretrain=True)
        pipe = self.rpn.run_pipeline(batch, train, thr_extra)
        losses = self.rpn.losses_from_pipeline(batch, pipe)
        rois, rscores, rlabels, rvalid, rbatch = self._proposals(pipe)
        rois = jax.lax.stop_gradient(rois)
        pts, feats, pvalid, pbatch = self._roi_points(pipe)
        roi_losses = self.roi.loss(
            pts, feats, pvalid, pbatch, rois, rlabels, rvalid, rbatch,
            batch.gt_boxes, batch.gt_labels, batch.gt_valid, train,
        )
        losses.update(roi_losses)
        return losses

    @property
    def point_cloud_range(self):
        return self.single_stage.get(
            "point_cloud_range", (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0))

    def predict_seg(self, batch, score_thr: float = 0.5):
        """Seg-eval protocol surface (per-point pred/gt labels) — delegates
        to the stage-1 segmentor (tools/test.py --eval seg)."""
        return self.rpn.predict_seg(batch, score_thr)

    def predict(self, batch, skip_rcnn: bool = False):
        pipe = self.rpn.run_pipeline(batch, train=False, detach_seg=False)
        if skip_rcnn:
            ex = pipe["ex"]
            return self.rpn.head_mod.get_bboxes(
                pipe["outs"], ex["cluster_xyz"], ex["cluster_batch"],
                ex["cluster_valid"], pipe["batch_size"], **self.rpn.test_cfg,
            )
        rois, rscores, rlabels, rvalid, rbatch = self._proposals(pipe)
        pts, feats, pvalid, pbatch = self._roi_points(pipe)
        return self.roi.predict(
            pts, feats, pvalid, pbatch, rois, rscores, rlabels, rvalid, rbatch,
            pipe["batch_size"], **{
                k: v for k, v in self.rpn.test_cfg.items()
                if k in ("nms_thr", "score_thr", "max_num", "use_rotate_nms")
            },
        )

    def __call__(self, batch, train: bool = False):
        pipe = self.rpn.run_pipeline(batch, train)
        rois, rscores, rlabels, rvalid, rbatch = self._proposals(pipe)
        pts, feats, pvalid, pbatch = self._roi_points(pipe)
        return self.roi.pool_and_forward(
            pts, feats, pvalid, pbatch, rois[:, :7], rvalid, rbatch, train
        )

"""SparseClusterHeadV2 — FSD's single-stage head over cluster features.

TPU rebuild of /root/reference/mmdet3d/models/dense_heads/
sparse_cluster_head_v2.py:45 (+ FSDSeparateHead :18) and the target
assignment from sparse_cluster_head.py:364 (cluster-center-in-enlarged-box).

Per task (class group): shared MLP → separate MLPs for score / center / dim /
rot. Regression uses BasePointBBoxCoder w.r.t. the cluster centroid.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sst_tpu.core import losses as L
from sst_tpu.core.box_coders import base_point_decode, base_point_encode
from sst_tpu.core.boxes import corners, enlarged_box, points_in_boxes
from sst_tpu.core.nms import box3d_multiclass_nms
from sst_tpu.models.layers import MLP


class FSDSeparateHead(nn.Module):
    attrs: tuple  # ((name, out_dim, num_layers, hidden), ...)
    norm: str = "ln"
    act: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid, train: bool = False):
        out = {}
        for name, out_dim, num_layers, hidden in self.attrs:
            out[name] = MLP(
                (hidden,) * num_layers + (out_dim,), act=self.act,
                norm=self.norm, is_head=True, dtype=self.dtype, name=name,
            )(x, valid, train)
        return out


class SparseClusterHeadV2(nn.Module):
    num_classes: int = 3
    tasks: tuple = (("Car",), ("Pedestrian",), ("Cyclist",))
    class_names: tuple = ("Car", "Pedestrian", "Cyclist")
    in_channel: int = 768
    shared_mlp_dims: Sequence[int] = (1024, 1024)
    num_cls_layer: int = 2
    cls_hidden_dim: int = 128
    common_attrs: tuple = (("center", 3, 2, 128), ("dim", 3, 2, 128), ("rot", 2, 2, 128))
    bbox_coder_scale: float = 1.0
    enlarge_width: float | None = None
    loss_cls_weight: float = 2.0
    loss_center_weight: float = 0.5
    loss_size_weight: float = 0.5
    loss_rot_weight: float = 0.2
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    norm: str = "ln"
    act: str = "relu"
    code_size: int = 8  # center 3 + logdim 3 + sincos 2 (+2 with velocity)
    with_vel: bool = False  # nuScenes velocity branch (code_size 10)
    loss_vel_weight: float = 0.2
    with_iou: bool = False  # IoU-score branch (sparse_cluster_head.py:339)
    loss_iou_weight: float = 1.0
    iou_score_weight: float = 0.5  # test-time rectification exponent `a`
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cluster_feats, valid, train: bool = False):
        x = cluster_feats
        if self.shared_mlp_dims:
            x = MLP(tuple(self.shared_mlp_dims), act=self.act, norm=self.norm,
                    dtype=self.dtype, name="shared_mlp")(x, valid, train)
        cls_logits, reg_preds, out_iou = [], [], []
        for t, names in enumerate(self.tasks):
            attrs = tuple(self.common_attrs) + (
                ("score", len(names), self.num_cls_layer, self.cls_hidden_dim),
            )
            if self.with_vel:
                attrs = attrs + (("vel", 2, 2, self.cls_hidden_dim),)
            if self.with_iou:
                attrs = attrs + (("iou", 1, 2, self.cls_hidden_dim),)
            ret = FSDSeparateHead(
                attrs=attrs, norm=self.norm, act=self.act, dtype=self.dtype,
                name=f"task_{t}",
            )(x, valid, train)
            cls_logits.append(ret["score"])
            reg = [ret["center"], ret["dim"], ret["rot"]]
            if self.with_vel:
                reg.append(ret["vel"])
            reg_preds.append(jnp.concatenate(reg, axis=-1))
            if self.with_iou:
                out_iou.append(ret["iou"][:, 0])
        out = {"cls_logits": cls_logits, "reg_preds": reg_preds}
        if self.with_iou:
            out["iou_logits"] = out_iou
        return out

    # ------------------------------------------------------------------ loss

    def _task_class_ids(self, task_id):
        return [self.class_names.index(n) for n in self.tasks[task_id]]

    def loss(self, outs, cluster_xyz, cluster_batch, cluster_valid,
             gt_boxes, gt_labels, gt_valid):
        """gt_*: [B, G, ...]; cluster_* are flat [C] with batch idx."""
        losses = {}
        for t in range(len(self.tasks)):
            losses.update(
                self._loss_single_task(
                    t, outs["cls_logits"][t], outs["reg_preds"][t],
                    cluster_xyz, cluster_batch, cluster_valid,
                    gt_boxes, gt_labels, gt_valid,
                    outs.get("iou_logits", [None] * len(self.tasks))[t],
                )
            )
        return losses

    def _loss_single_task(self, task_id, cls_logits, reg_preds, cluster_xyz,
                          cluster_batch, cluster_valid, gt_boxes, gt_labels,
                          gt_valid, iou_logits=None):
        ids = self._task_class_ids(task_id)
        num_task_classes = len(ids)
        # remap gt labels into task-local ids; drop other classes
        task_gt_valid = gt_valid & jnp.isin(gt_labels, jnp.asarray(ids))
        local = jnp.zeros_like(gt_labels)
        for li, ci in enumerate(ids):
            local = jnp.where(gt_labels == ci, li, local)

        # assignment: cluster center inside (enlarged) gt box of this task,
        # batch-aware via per-sample loop (B is small & static)
        b = gt_boxes.shape[0]
        assigned = jnp.full(cluster_xyz.shape[0], -1, jnp.int32)
        for i in range(b):
            boxes_i = gt_boxes[i]
            if self.enlarge_width is not None:
                boxes_i = enlarged_box(boxes_i, self.enlarge_width)
            inb = points_in_boxes(cluster_xyz, boxes_i)  # [C, G]
            inb = inb & task_gt_valid[i][None, :] & (cluster_batch == i)[:, None]
            any_in = inb.any(axis=1)
            first = jnp.argmax(inb, axis=1).astype(jnp.int32)
            assigned = jnp.where(any_in & cluster_valid, i * gt_boxes.shape[1] + first, assigned)

        gt_flat = gt_boxes.reshape(-1, gt_boxes.shape[-1])
        lbl_flat = local.reshape(-1)
        is_pos = assigned >= 0
        safe = jnp.maximum(assigned, 0)
        labels = jnp.where(is_pos, lbl_flat[safe], num_task_classes)
        matched = gt_flat[safe]

        num_total = jnp.maximum(cluster_valid.sum().astype(jnp.float32), 1.0)
        w = cluster_valid.astype(jnp.float32)
        loss_cls = L.sigmoid_focal_loss(
            cls_logits, labels, weight=w, gamma=self.focal_gamma,
            alpha=self.focal_alpha, avg_factor=num_total,
        ) * self.loss_cls_weight

        targets = base_point_encode(cluster_xyz, matched[:, :7], self.bbox_coder_scale)
        pw = is_pos.astype(jnp.float32)
        num_pos = jnp.maximum(pw.sum(), 1.0)
        loss_center = L.l1_loss(reg_preds[:, :3], targets[:, :3], pw, num_pos) * self.loss_center_weight
        loss_size = L.l1_loss(reg_preds[:, 3:6], targets[:, 3:6], pw, num_pos) * self.loss_size_weight
        loss_rot = L.l1_loss(reg_preds[:, 6:8], targets[:, 6:8], pw, num_pos) * self.loss_rot_weight
        out = {
            f"loss_cls.task{task_id}": loss_cls,
            f"loss_center.task{task_id}": loss_center,
            f"loss_size.task{task_id}": loss_size,
            f"loss_rot.task{task_id}": loss_rot,
        }
        if self.with_vel:
            vel_t = matched[:, 7:9] if matched.shape[-1] >= 9 else \
                jnp.zeros_like(reg_preds[:, 8:10])
            out[f"loss_vel.task{task_id}"] = L.l1_loss(
                reg_preds[:, 8:10], vel_t, pw, num_pos
            ) * self.loss_vel_weight
        if self.with_iou and iou_logits is not None:
            # IoU-score supervision (sparse_cluster_head.py:329-360
            # get_iou_labels): target = 3D IoU(decoded pred, matched gt) for
            # positives, 0 for negatives; L1 on the raw logit.
            from sst_tpu.core.iou import boxes_iou_3d

            decoded = jax.lax.stop_gradient(
                base_point_decode(cluster_xyz, reg_preds, self.bbox_coder_scale)
            )
            pair_iou = jax.vmap(
                lambda d, g: boxes_iou_3d(d[None, :7], g[None, :7])[0, 0]
            )(decoded, matched)
            iou_t = jnp.where(is_pos, pair_iou, 0.0)
            out[f"loss_iou.task{task_id}"] = L.l1_loss(
                iou_logits, iou_t, weight=w, avg_factor=num_total
            ) * self.loss_iou_weight
        return out

    # ------------------------------------------------------------- inference

    def get_bboxes(self, outs, cluster_xyz, cluster_batch, cluster_valid,
                   batch_size: int, score_thr=0.1, nms_thr=0.25, max_num=500,
                   nms_pre=1024, use_rotate_nms=True):
        """Per-sample decoded + NMS'd boxes across tasks, padded [B, max_num]."""
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for t, names in enumerate(self.tasks):
            ids = self._task_class_ids(t)
            scores = jax.nn.sigmoid(outs["cls_logits"][t])
            if self.with_iou and "iou_logits" in outs:
                # score rectification (sparse_cluster_head.py get_bboxes:
                # s = cls^(1-a) * iou^a)
                a = self.iou_score_weight
                iou_s = jax.nn.sigmoid(outs["iou_logits"][t])[:, None]
                scores = scores ** (1 - a) * jnp.clip(iou_s, 1e-4) ** a
            boxes = base_point_decode(cluster_xyz, outs["reg_preds"][t],
                                      self.bbox_coder_scale)  # vel-aware
            all_boxes.append(boxes)
            # expand task scores to global class columns
            full = jnp.zeros((scores.shape[0], self.num_classes), scores.dtype)
            for li, ci in enumerate(ids):
                full = full.at[:, ci].set(scores[:, li])
            all_scores.append(full)
            all_valid.append(cluster_valid)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = jnp.concatenate(all_valid)
        batch = jnp.concatenate([cluster_batch] * len(self.tasks))

        results = []
        for i in range(batch_size):
            m = valid & (batch == i)
            results.append(
                box3d_multiclass_nms(
                    boxes, scores, m, num_classes=self.num_classes,
                    score_thr=score_thr, nms_thr=nms_thr,
                    nms_pre=nms_pre, max_num=max_num,
                    use_rotate_nms=use_rotate_nms,
                )
            )
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *results)

"""CenterHead — CenterPoint heatmap head over BEV feature maps.

TPU rebuild of /root/reference/mmdet3d/models/dense_heads/centerpoint_head.py
(:18 SeparateHead, :242 CenterHead) + core/bbox/coders/centerpoint_bbox_coders
.py, used by the SST center-head configs (configs/sst_refactor/*centerhead*).

TPU-native choices:
  - heatmap targets are rendered densely (per-pixel max over gaussians) —
    a fused elementwise pass instead of the reference's per-object numpy
    `draw_heatmap_gaussian` scatter loop;
  - regression targets are gathered at gt center pixels with a static
    max_objs cap (the reference's ind/mask scheme, already static);
  - decode = 3x3 max-pool peak NMS + top-k + optional circle NMS, all
    fixed-shape.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from sst_tpu.core import losses as L
from sst_tpu.core.nms import box3d_multiclass_nms, circle_nms, topk_presort
from sst_tpu.models.layers import ConvNormAct


def gaussian_radius(box_wl, min_overlap: float = 0.1):
    """CornerNet radius (reference core/utils/gaussian.py:56-86).

    NOTE: all three roots divide by 2, NOT by 2a — the reference (and
    upstream CenterNet/CenterPoint) keep that historical quirk, and the
    published models trained with it, so target parity requires matching it
    rather than the textbook quadratic root."""
    w, l = box_wl[..., 0], box_wl[..., 1]
    b1 = l + w
    c1 = w * l * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))
    r1 = (b1 + sq1) / 2
    a2 = 4.0
    b2 = 2 * (l + w)
    c2 = (1 - min_overlap) * w * l
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (l + w)
    c3 = (min_overlap - 1) * w * l
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def gaussian_focal_loss(pred_sigmoid, gt_heatmap, pos_mask, alpha=2.0,
                        gamma=4.0):
    """mmdet GaussianFocalLoss (CenterNet): penalty-reduced focal."""
    eps = 1e-6
    pos = -jnp.log(pred_sigmoid + eps) * (1 - pred_sigmoid) ** alpha * pos_mask
    neg = (
        -jnp.log(1 - pred_sigmoid + eps)
        * pred_sigmoid ** alpha
        * (1 - gt_heatmap) ** gamma
        * (1 - pos_mask)
    )
    return pos + neg


class SeparateHead(nn.Module):
    """Per-attribute conv branches (centerpoint_head.py:18)."""

    heads: tuple  # ((name, out_ch, num_convs), ...)
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = {}
        for name, out_ch, num_convs in self.heads:
            h = x
            for i in range(num_convs - 1):
                h = ConvNormAct(self.head_conv, 3, dtype=self.dtype,
                                name=f"{name}_conv{i}")(h, train)
            bias = self.init_bias if name == "heatmap" else 0.0
            h = nn.Conv(out_ch, (3, 3), padding=1, use_bias=True,
                        bias_init=nn.initializers.constant(bias),
                        dtype=self.dtype, name=f"{name}_out")(h)
            out[name] = h
        return out


class CenterHead(nn.Module):
    tasks: tuple = (("Car",), ("Pedestrian",), ("Cyclist",))
    class_names: tuple = ("Car", "Pedestrian", "Cyclist")
    in_channels: int = 384
    share_conv_channel: int = 64
    head_conv: int = 64
    common_heads: tuple = (("reg", 2, 2), ("height", 1, 2), ("dim", 3, 2),
                           ("rot", 2, 2))
    with_velocity: bool = False
    point_cloud_range: tuple = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)
    voxel_size: tuple = (0.32, 0.32, 6.0)
    out_size_factor: int = 1
    max_objs: int = 500
    gaussian_overlap: float = 0.1
    min_radius: float = 2.0
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 0.25
    code_weights: tuple = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    norm_bbox: bool = True  # log-dims
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev, train: bool = False):
        """bev: [B, H, W, C] → list of per-task dicts of [B, H, W, *]."""
        x = ConvNormAct(self.share_conv_channel, 3, dtype=self.dtype,
                        name="shared_conv")(bev, train)
        outs = []
        for t, names in enumerate(self.tasks):
            heads = tuple(self.common_heads) + (("heatmap", len(names), 2),)
            if self.with_velocity:
                heads = heads + (("vel", 2, 2),)
            outs.append(
                SeparateHead(heads=heads, head_conv=self.head_conv,
                             dtype=self.dtype, name=f"task_{t}")(x, train)
            )
        return outs

    # ------------------------------------------------------------- targets

    def _grid(self, shape):
        h, w = shape
        vs = self.voxel_size
        pcr = self.point_cloud_range
        xs = (jnp.arange(w) + 0.5) * vs[0] * self.out_size_factor + pcr[0]
        ys = (jnp.arange(h) + 0.5) * vs[1] * self.out_size_factor + pcr[1]
        return xs, ys

    def heatmap_targets(self, shape, gt_boxes, gt_labels, gt_valid, task_id):
        """Dense per-pixel max-of-gaussians heatmap [B, H, W, C_task] +
        'exact center pixel' mask for the focal positive term."""
        names = self.tasks[task_id]
        ids = [self.class_names.index(n) for n in names]
        h, w = shape
        xs, ys = self._grid(shape)
        stride = self.voxel_size[0] * self.out_size_factor

        def per_sample(boxes, labels, valid):
            maps, poss = [], []
            r = gaussian_radius(
                boxes[:, jnp.array([3, 4])] / stride, self.gaussian_overlap
            )
            # int truncation before max(min_radius) and sigma = diameter/6,
            # matching the reference target values exactly for pixel-aligned
            # centers (centerpoint_head.py radius = max(min_radius, int(r));
            # gaussian.py:37 sigma = diameter / 6)
            r = jnp.maximum(jnp.floor(r), self.min_radius)
            sigma = (2 * r + 1) / 6.0 * stride
            cx = boxes[:, 0]
            cy = boxes[:, 1]
            px = jnp.clip(jnp.floor((cx - self.point_cloud_range[0]) / stride),
                          0, w - 1)
            py = jnp.clip(jnp.floor((cy - self.point_cloud_range[1]) / stride),
                          0, h - 1)
            d2 = (
                (xs[None, None, :] - cx[:, None, None]) ** 2
                + (ys[None, :, None] - cy[:, None, None]) ** 2
            )  # [G, H, W]
            gauss = jnp.exp(-d2 / (2 * sigma[:, None, None] ** 2))
            ix = jnp.arange(w)[None, None, :]
            iy = jnp.arange(h)[None, :, None]
            is_ctr = (ix == px[:, None, None]) & (iy == py[:, None, None])
            for li, ci in enumerate(ids):
                m = valid & (labels == ci)
                g = jnp.where(m[:, None, None], gauss, 0.0)
                maps.append(g.max(axis=0))
                poss.append(
                    jnp.where(m[:, None, None], is_ctr, False).any(axis=0)
                )
            return jnp.stack(maps, -1), jnp.stack(poss, -1)

        return jax.vmap(per_sample)(gt_boxes, gt_labels, gt_valid)

    def loss(self, outs, gt_boxes, gt_labels, gt_valid):
        losses = {}
        for t, names in enumerate(self.tasks):
            ids = [self.class_names.index(n) for n in names]
            pred = outs[t]
            b, h, w, _ = pred["heatmap"].shape
            hm_t, pos_t = self.heatmap_targets((h, w), gt_boxes, gt_labels,
                                               gt_valid, t)
            hm_p = jax.nn.sigmoid(pred["heatmap"].astype(jnp.float32))
            num_pos = jnp.maximum(pos_t.sum(), 1.0)
            losses[f"loss_heatmap.task{t}"] = (
                gaussian_focal_loss(hm_p, hm_t, pos_t.astype(jnp.float32)).sum()
                / num_pos * self.loss_cls_weight
            )
            # regression at gt center pixels
            stride = self.voxel_size[0] * self.out_size_factor
            task_gt = gt_valid & jnp.isin(gt_labels, jnp.asarray(ids))
            px = jnp.floor((gt_boxes[..., 0] - self.point_cloud_range[0]) / stride)
            py = jnp.floor((gt_boxes[..., 1] - self.point_cloud_range[1]) / stride)
            inb = (px >= 0) & (px < w) & (py >= 0) & (py < h) & task_gt
            pxc = jnp.clip(px, 0, w - 1).astype(jnp.int32)
            pyc = jnp.clip(py, 0, h - 1).astype(jnp.int32)

            def gather_at(maps):  # [B, H, W, C] → [B, G, C]
                return jax.vmap(lambda m, yy, xx: m[yy, xx])(maps, pyc, pxc)

            reg_p = gather_at(pred["reg"].astype(jnp.float32))
            hgt_p = gather_at(pred["height"].astype(jnp.float32))
            dim_p = gather_at(pred["dim"].astype(jnp.float32))
            rot_p = gather_at(pred["rot"].astype(jnp.float32))
            preds = [reg_p, hgt_p, dim_p, rot_p]

            xs_t = (gt_boxes[..., 0] - self.point_cloud_range[0]) / stride - (
                pxc + 0.5)
            ys_t = (gt_boxes[..., 1] - self.point_cloud_range[1]) / stride - (
                pyc + 0.5)
            dim_t = jnp.log(jnp.maximum(gt_boxes[..., 3:6], 1e-3)) \
                if self.norm_bbox else gt_boxes[..., 3:6]
            tgts = [
                jnp.stack([xs_t, ys_t], -1),
                gt_boxes[..., 2:3] + gt_boxes[..., 5:6] / 2,  # gravity z
                dim_t,
                jnp.stack([jnp.sin(gt_boxes[..., 6]),
                           jnp.cos(gt_boxes[..., 6])], -1),
            ]
            if self.with_velocity:
                preds.append(gather_at(pred["vel"].astype(jnp.float32)))
                tgts.append(gt_boxes[..., 7:9])
            pred_cat = jnp.concatenate(preds, -1)
            tgt_cat = jnp.concatenate(tgts, -1)
            cw = jnp.asarray(self.code_weights[: pred_cat.shape[-1]])
            nb = jnp.maximum(inb.sum(), 1.0)
            lb = (
                jnp.abs(pred_cat - tgt_cat) * cw[None, None, :]
                * inb[..., None]
            ).sum() / nb
            losses[f"loss_bbox.task{t}"] = lb * self.loss_bbox_weight
        return losses

    # ------------------------------------------------------------- decode

    def get_bboxes(self, outs, nms_pre: int = 1024, score_thr: float = 0.1,
                   nms_thr: float = 0.25, max_num: int = 500,
                   use_rotate_nms: bool = True, use_circle_nms: bool = False,
                   circle_thresh: float = 4.0):
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        stride = self.voxel_size[0] * self.out_size_factor
        for t, names in enumerate(self.tasks):
            ids = [self.class_names.index(n) for n in names]
            pred = outs[t]
            hm = jax.nn.sigmoid(pred["heatmap"].astype(jnp.float32))
            b, h, w, c = hm.shape
            # 3x3 max-pool peak keeping (centerpoint "nms")
            pooled = jax.lax.reduce_window(
                hm, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                "SAME",
            )
            hm = jnp.where(hm == pooled, hm, 0.0)
            flat = hm.reshape(b, h * w * c)
            scores, inds = jax.lax.top_k(flat, nms_pre)
            cls = inds % c
            pix = inds // c
            xi = pix % w
            yi = pix // w

            def dec(pmap, yy, xx):
                return jax.vmap(lambda m, a, b2: m[a, b2])(pmap, yy, xx)

            reg = dec(pred["reg"].astype(jnp.float32), yi, xi)
            hgt = dec(pred["height"].astype(jnp.float32), yi, xi)[..., 0]
            dim = dec(pred["dim"].astype(jnp.float32), yi, xi)
            rot = dec(pred["rot"].astype(jnp.float32), yi, xi)
            x = (xi + 0.5 + reg[..., 0]) * stride + self.point_cloud_range[0]
            y = (yi + 0.5 + reg[..., 1]) * stride + self.point_cloud_range[1]
            dims = jnp.exp(dim) if self.norm_bbox else dim
            yaw = jnp.arctan2(rot[..., 0], rot[..., 1])
            z = hgt - dims[..., 2] / 2  # back to bottom center
            boxes = jnp.stack([x, y, z], -1)
            boxes = jnp.concatenate([boxes, dims, yaw[..., None]], -1)
            if self.with_velocity:
                vel = dec(pred["vel"].astype(jnp.float32), yi, xi)
                boxes = jnp.concatenate([boxes, vel], -1)
            glb = jnp.asarray(ids, jnp.int32)[cls]
            sc = jax.nn.one_hot(glb, len(self.class_names)) * scores[..., None]
            all_boxes.append(boxes)
            all_scores.append(sc)
            all_labels.append(glb)
            all_valid.append(scores > score_thr)
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)

        results = []
        for i in range(boxes.shape[0]):
            if use_circle_nms:
                order, sv = topk_presort(scores[i].max(-1), valid[i],
                                         min(nms_pre, boxes.shape[1]))
                bsorted = boxes[i][order]
                ssorted = scores[i][order]
                keep = circle_nms(bsorted[:, :2], ssorted.max(-1), sv,
                                  circle_thresh)
                best = ssorted.max(-1)
                lbl = ssorted.argmax(-1)
                top, ti = jax.lax.top_k(jnp.where(keep, best, -jnp.inf),
                                        max_num)
                results.append({
                    "boxes": bsorted[ti],
                    "scores": jnp.where(jnp.isfinite(top), top, 0.0),
                    "labels": lbl[ti],
                    "valid": jnp.isfinite(top),
                })
            else:
                results.append(
                    box3d_multiclass_nms(
                        boxes[i], scores[i], valid[i],
                        num_classes=len(self.class_names),
                        score_thr=score_thr, nms_thr=nms_thr,
                        nms_pre=min(nms_pre, boxes.shape[1]),
                        max_num=max_num, use_rotate_nms=use_rotate_nms,
                    )
                )
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *results)

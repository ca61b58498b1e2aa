"""FSD two-stage RoI refinement: GroupCorrectionHead + FullySparseBboxHead.

TPU rebuild of /root/reference/mmdet3d/models/roi_heads/fsd_roi_head.py:15,
bbox_heads/fsd_bbox_head.py:20 and the TorchEx ``dynamic_point_pool`` op
(ops/dynamic_point_pool_op.py:12).

The CUDA pooling (variable pairs, atomics, caps) becomes a static [R, K]
pairing: per roi, the first K in-box points (by point index) with their
13-dim geometry features — built roi-major (candidate compaction + column
cumsum + per-roi searchsorted), so a point pairs with EVERY containing roi
exactly like the CUDA op. RoI grouping is then a *static* segment layout —
pair (r, k) belongs to group r — so SIR² pooling needs no unique at all.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sst_tpu.core import losses as L
from sst_tpu.core.box_coders import delta_decode, delta_encode
from sst_tpu.core.boxes import corners, limit_period, rotate_2d
from sst_tpu.core.iou import boxes_iou_3d
from sst_tpu.core.target_assign import iou_neg_piecewise_sample
from sst_tpu.core.nms import nms_bev, topk_presort
from sst_tpu.models.fsd.sir import SIRLayer
from sst_tpu.models.layers import MLP
from sst_tpu.ops.ccl import topk_compact
from sst_tpu.ops.segment import segment_reduce


def _local_frame(points_xyz, pts_rois):
    """Per-row box-local coords (lw: along box w, ll: along l, lz from box
    top-center), for points_xyz [N,3] paired 1:1 with pts_rois [N,7]."""
    relx = points_xyz[:, 0] - pts_rois[:, 0]
    rely = points_xyz[:, 1] - pts_rois[:, 1]
    c, s = jnp.cos(pts_rois[:, 6]), jnp.sin(pts_rois[:, 6])
    lw = relx * c - rely * s  # rotate_2d(rel, -yaw)[..., 0]
    ll = relx * s + rely * c
    lz = points_xyz[:, 2] - (pts_rois[:, 2] + pts_rois[:, 5] / 2)
    return lw, ll, lz


def _inside_rois(pts, pv, pb, rois, roi_valid, roi_batch, ex):
    """[M, R] bool: point i inside (extra_wlh-enlarged, batch-matched) roi j."""
    cos, sin = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    wh = rois[:, 3] / 2 + ex[0]
    lh = rois[:, 4] / 2 + ex[1]
    hh = rois[:, 5] / 2 + ex[2]
    zc = rois[:, 2] + rois[:, 5] / 2
    relx = pts[:, 0, None] - rois[None, :, 0]
    rely = pts[:, 1, None] - rois[None, :, 1]
    lw = relx * cos[None] - rely * sin[None]
    ll = relx * sin[None] + rely * cos[None]
    lz = pts[:, 2, None] - zc[None]
    return (
        (jnp.abs(lw) <= wh[None]) & (jnp.abs(ll) <= lh[None])
        & (jnp.abs(lz) <= hh[None])
        & pv[:, None] & roi_valid[None] & (pb[:, None] == roi_batch[None])
    )


def dynamic_point_pool(points_xyz, pts_valid, pts_batch, rois, roi_valid,
                       roi_batch, extra_wlh=(0.5, 0.5, 0.5),
                       max_inbox_point: int = 256,
                       max_paired_points: int = 65536, chunk: int = 16384):
    """[R, K] in-box point pairing + 13-dim geometry.

    Roi-major pairing with exact reference semantics (TorchEx
    ops/dynamic_point_pool_op.py:12): EVERY containing roi pairs the point;
    the only trim is the per-roi ``max_inbox_point`` cap the reference also
    applies (ours keeps ascending point order where CUDA atomics keep
    arrival order). Shape discipline: a chunked any-membership pass selects
    the ≤``max_paired_points`` candidate points that touch any roi (counter
    ``membership_overflow`` if exceeded — the only capacity deviation), then
    a column cumsum over the [M, R] candidate-membership matrix ranks each
    point within each containing roi and a per-roi ``searchsorted`` gathers
    the first K — no sort, no per-point membership bound.

    Returns dict: idx [R,K] point indices, valid [R,K], geo [R,K,13] =
    (local_l, local_w, local_z, off_l-, off_w-, off_z-, off_l+, off_w+,
     off_z+, in_margin, rel_xyz(3)), membership_overflow (candidate-cap
     dropped points), inbox_overflow (pairs beyond the per-roi K cap — the
     reference drops these too).
    """
    r = rois.shape[0]
    n = points_xyz.shape[0]
    k = max_inbox_point
    m = min(max_paired_points, n)
    ex = jnp.asarray(extra_wlh, jnp.float32)

    # 1) chunked any-membership pass over all points
    pad = (-n) % chunk
    pts = jnp.concatenate([points_xyz, jnp.zeros((pad, 3), points_xyz.dtype)])
    pv = jnp.concatenate([pts_valid, jnp.zeros((pad,), bool)])
    pb = jnp.concatenate([pts_batch, jnp.full((pad,), -1, pts_batch.dtype)])
    any_in = jax.lax.map(
        lambda a: _inside_rois(a[0], a[1], a[2], rois, roi_valid, roi_batch,
                               ex).any(axis=1),
        (pts.reshape(-1, chunk, 3), pv.reshape(-1, chunk),
         pb.reshape(-1, chunk)),
    ).reshape(-1)[:n]

    # 2) candidate compaction in ascending point order (top_k on -index)
    cand_idx, cand_valid = topk_compact(
        -jnp.arange(n, dtype=jnp.float32), any_in, m)
    mem_overflow = (any_in.sum() - cand_valid.sum()).astype(jnp.int32)

    # 3) candidate membership matrix + within-roi ranks (column cumsum)
    cpts = points_xyz[cand_idx]
    cpb = pts_batch[cand_idx]
    inside = _inside_rois(cpts, cand_valid, cpb, rois, roi_valid, roi_batch,
                          ex)  # [M, R]
    csum = jnp.cumsum(inside.astype(jnp.int32), axis=0)
    counts = csum[-1]  # [R] in-roi point counts
    inbox_overflow = jnp.maximum(counts - k, 0).sum().astype(jnp.int32)

    # 4) q-th inside point of roi j = first row where csum[:, j] >= q
    qs = jnp.arange(1, k + 1, dtype=csum.dtype)
    pos = jax.vmap(lambda col: jnp.searchsorted(col, qs, side="left"))(
        csum.T)  # [R, K]
    pv = (qs[None, :] <= counts[:, None]) & roi_valid[:, None]
    idx = jnp.where(pv, cand_idx[jnp.minimum(pos, m - 1)], 0)

    # 13-dim geometry, recomputed only for the selected [R, K] pairs
    flat_idx = idx.reshape(-1)
    pts = points_xyz[flat_idx]
    proi = jnp.repeat(rois, k, axis=0)
    lw, ll, lz = _local_frame(pts, proi)
    w2, l2, h2 = proi[:, 3] / 2, proi[:, 4] / 2, proi[:, 5] / 2
    inside_core = ((jnp.abs(lw) <= w2) & (jnp.abs(ll) <= l2)
                   & (jnp.abs(lz) <= h2))
    geo = jnp.stack(
        [ll, lw, lz,
         l2 - ll, w2 - lw, h2 - lz,
         l2 + ll, w2 + lw, h2 + lz,
         (~inside_core).astype(jnp.float32)],
        axis=-1,
    )
    geo = jnp.concatenate([geo, pts - proi[:, :3]], axis=-1)
    geo = jnp.where(pv.reshape(-1)[:, None], geo, 0.0).reshape(r, k, 13)
    return {"idx": idx, "valid": pv, "geo": geo,
            "membership_overflow": mem_overflow,
            "inbox_overflow": inbox_overflow}


def canonical_gt(rois, gts):
    """gt → roi canonical frame (fsd_bbox_head.py:420-447)."""
    ctr = gts[:, :3] - rois[:, :3]
    roi_ry = rois[:, 6] % (2 * np.pi)
    ang = -(roi_ry + np.pi / 2)
    rot = rotate_2d(ctr[:, :2], -ang)  # rotation_3d_in_axis rotates by -θ in
    # our rotate_2d convention; pass -ang to match reference sign
    ctr = jnp.concatenate([rot, ctr[:, 2:3]], -1)
    ry = (gts[:, 6] - roi_ry) % (2 * np.pi)
    opposite = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
    ry = jnp.where(opposite, (ry + np.pi) % (2 * np.pi), ry)
    ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    ry = jnp.clip(ry, -np.pi / 2, np.pi / 2)
    return jnp.concatenate([ctr, gts[:, 3:6], ry[:, None]], -1)


def decode_rcnn(rois, preds):
    """Inverse of canonical encode (fsd_bbox_head.py:639-654)."""
    anchors = rois.at[:, :3].set(0.0)
    local = delta_decode(anchors.at[:, 6].set(rois[:, 6]), preds)
    # reference decodes against local_roi_boxes which keep roi yaw; then
    # rotates centers by (roi_ry + pi/2) and translates.
    ang = rois[:, 6] + np.pi / 2
    xy = rotate_2d(local[:, :2], -ang)
    out = local.at[:, :2].set(xy + rois[:, :2])
    out = out.at[:, 2].add(rois[:, 2])
    return out


class FullySparseBboxHead(nn.Module):
    num_classes: int = 3
    num_blocks: int = 6
    feat_channels: tuple = ((128, 128),) * 6
    rel_mlp_hidden: tuple = ((16, 32),) * 6
    reg_mlp: tuple = (512, 512)
    cls_mlp: tuple = (512, 512)
    xyz_normalizer: tuple = (20.0, 20.0, 4.0)
    act: str = "gelu"
    norm: str = "ln"
    code_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pair_pts, pair_feats, pair_geo, pair_valid, num_rois: int,
                 train: bool = False):
        """pair_*: flattened [R*K, ...]; group r = index // K."""
        k = pair_pts.shape[0] // num_rois
        seg_ids = jnp.repeat(jnp.arange(num_rois, dtype=jnp.int32), k)
        seg_ids = jnp.where(pair_valid, seg_ids, num_rois)
        out_feats = pair_feats
        cluster_list = []
        for i in range(self.num_blocks):
            x = jnp.concatenate(
                [pair_pts, out_feats, pair_geo / 10.0], axis=-1
            )
            out_feats, cfeat = SIRLayer(
                feat_channels=tuple(self.feat_channels[i]),
                rel_mlp_hidden=tuple(self.rel_mlp_hidden[i]),
                mode="max", xyz_normalizer=self.xyz_normalizer,
                norm=self.norm, act=self.act, dtype=self.dtype,
                name=f"block_{i}",
            )(x, pair_geo[:, :3] * 10.0, seg_ids, num_rois, pair_valid, train)
            cluster_list.append(cfeat)
        roi_feats = jnp.concatenate(cluster_list, axis=-1)
        nonempty = segment_reduce(
            pair_valid.astype(jnp.float32), seg_ids, num_rois, "sum"
        ) > 0
        cls_score = MLP(tuple(self.cls_mlp) + (1,), act=self.act, norm=self.norm,
                        is_head=True, dtype=self.dtype, name="conv_cls")(
            roi_feats, nonempty, train)
        bbox_pred = MLP(tuple(self.reg_mlp) + (self.code_size,), act=self.act,
                        norm=self.norm, is_head=True, dtype=self.dtype,
                        name="conv_reg")(roi_feats, nonempty, train)
        return cls_score[:, 0], bbox_pred, nonempty


class GroupCorrectionHead(nn.Module):
    """Assign + sample proposals, pool in-box points, refine with SIR²."""

    num_classes: int = 3
    extra_wlh: tuple = (0.5, 0.5, 0.5)
    max_inbox_point: int = 256
    # candidate buffer for points inside ≥1 enlarged roi; pairing itself is
    # uncapped per point (reference CUDA op semantics). Points dropped here
    # are counted in losses['roi_membership_overflow'] — lift if nonzero.
    max_paired_points: int = 65536
    num_rois: int = 256
    pos_iou_thr: tuple = (0.45, 0.35, 0.35)
    cls_pos_thr: tuple = (0.8, 0.65, 0.65)
    cls_neg_thr: tuple = (0.2, 0.15, 0.15)
    loss_bbox_weight: float = 2.0
    loss_cls_weight: float = 1.0
    corner_loss_weight: float = 1.0
    corner_loss_only_car: bool = True
    # IoUNegPiecewiseSampler (iou_neg_piecewise_sampler.py; configs/fsd
    # train_cfg.rcnn.sampler): dict(num=256, pos_fraction=0.55,
    # neg_piece_fractions=(0.8, 0.2), neg_iou_piece_thrs=(0.55, 0.1)).
    # None keeps every proposal slot (soft weighting only).
    sampler: dict = None
    bbox_head: dict = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bbox_head_mod = FullySparseBboxHead(
            num_classes=self.num_classes, dtype=self.dtype,
            **(self.bbox_head or {}),
        )

    def pool_and_forward(self, pts_xyz, pts_feats, pts_valid, pts_batch,
                         rois, roi_valid, roi_batch, train: bool):
        pool = dynamic_point_pool(
            pts_xyz[:, :3], pts_valid, pts_batch, rois, roi_valid, roi_batch,
            self.extra_wlh, self.max_inbox_point, self.max_paired_points,
        )
        r, k = pool["idx"].shape
        flat_idx = pool["idx"].reshape(-1)
        pair_pts = pts_xyz[flat_idx]
        pair_feats = pts_feats[flat_idx]
        pair_valid = pool["valid"].reshape(-1)
        pair_geo = pool["geo"].reshape(-1, 13)
        pair_pts = jnp.where(pair_valid[:, None], pair_pts, 0.0)
        pair_feats = jnp.where(pair_valid[:, None], pair_feats, 0.0)
        return self.bbox_head_mod(
            pair_pts, pair_feats, pair_geo, pair_valid, r, train
        ) + (pool["membership_overflow"],)

    # -------------------------------------------------------------- training

    def assign_and_sample(self, proposals, prop_labels, prop_valid, prop_batch,
                          gt_boxes, gt_labels, gt_valid):
        """Per-proposal max-IoU3D vs same-class gts of its sample. Static:
        keeps all proposal slots (the caller already capped them); sampling
        reduces to weighting."""
        b, g = gt_boxes.shape[0], gt_boxes.shape[1]
        gt_flat = gt_boxes.reshape(-1, gt_boxes.shape[-1])
        gl_flat = gt_labels.reshape(-1)
        gv_flat = gt_valid.reshape(-1)
        iou = boxes_iou_3d(proposals[:, :7], gt_flat[:, :7])  # [P, B*G]
        same_batch = prop_batch[:, None] == jnp.repeat(
            jnp.arange(b, dtype=jnp.int32), g
        )[None, :]
        same_cls = prop_labels[:, None] == gl_flat[None, :]
        iou = jnp.where(same_batch & same_cls & gv_flat[None, :], iou, -1.0)
        max_iou = iou.max(axis=1)
        argmax = iou.argmax(axis=1).astype(jnp.int32)
        thr = jnp.asarray(self.pos_iou_thr)[jnp.minimum(prop_labels, self.num_classes - 1)]
        is_pos = (max_iou >= thr) & prop_valid
        return max_iou, argmax, is_pos

    def loss(self, pts_xyz, pts_feats, pts_valid, pts_batch, proposals,
             prop_labels, prop_valid, prop_batch, gt_boxes, gt_labels,
             gt_valid, train: bool = True):
        max_iou, argmax, is_pos = self.assign_and_sample(
            proposals, prop_labels, prop_valid, prop_batch,
            gt_boxes, gt_labels, gt_valid,
        )
        sampled = prop_valid
        if train and self.sampler is not None:
            sampled = iou_neg_piecewise_sample(
                self.make_rng("sampler"), max_iou, is_pos, prop_valid,
                self.sampler["num"], self.sampler["pos_fraction"],
                tuple(self.sampler["neg_piece_fractions"]),
                tuple(self.sampler["neg_iou_piece_thrs"]),
            )
        cls_score, bbox_pred, nonempty, mem_overflow = self.pool_and_forward(
            pts_xyz, pts_feats, pts_valid, pts_batch,
            proposals[:, :7], prop_valid, prop_batch, train,
        )
        # soft labels (fsd_bbox_head.py:486-545)
        pos_t = jnp.asarray(self.cls_pos_thr)[jnp.minimum(prop_labels, self.num_classes - 1)]
        neg_t = jnp.asarray(self.cls_neg_thr)[jnp.minimum(prop_labels, self.num_classes - 1)]
        soft = jnp.clip((max_iou - neg_t) / (pos_t - neg_t), 0.0, 1.0)
        lw = (sampled & nonempty).astype(jnp.float32)
        lw_sum = jnp.maximum(lw.sum(), 1.0)
        loss_cls = L.binary_cross_entropy_loss(
            cls_score, soft, weight=lw, avg_factor=lw_sum
        ) * self.loss_cls_weight

        gt_flat = gt_boxes.reshape(-1, gt_boxes.shape[-1])
        matched = gt_flat[jnp.maximum(argmax, 0)]
        # zero-dim padded gt rows would NaN delta_encode's log (0 * nan = nan
        # through the masked loss); substitute a unit box for non-positives
        unit = jnp.zeros((matched.shape[-1],), jnp.float32).at[3:6].set(1.0)
        matched = jnp.where(is_pos[:, None], matched, unit[None])
        ct = canonical_gt(proposals[:, :7], matched[:, :7])
        anchors = proposals[:, :7].at[:, :3].set(0.0).at[:, 6].set(0.0)
        targets = delta_encode(anchors, ct)
        rw = (is_pos & sampled & nonempty).astype(jnp.float32)
        rw_sum = jnp.maximum(rw.sum(), 1.0)
        loss_bbox = L.l1_loss(bbox_pred, targets, weight=rw, avg_factor=rw_sum) * self.loss_bbox_weight

        # corner loss (car only by default)
        decoded = decode_rcnn(proposals[:, :7], bbox_pred)
        gt_corners = corners(matched[:, :7])
        gt_flip = corners(matched[:, :7].at[:, 6].add(np.pi))
        pred_corners = corners(decoded)
        cd = jnp.minimum(
            jnp.linalg.norm(pred_corners - gt_corners, axis=-1),
            jnp.linalg.norm(pred_corners - gt_flip, axis=-1),
        )
        huber = jnp.where(cd < 1.0, 0.5 * cd**2, cd - 0.5).mean(-1)
        cw = rw
        if self.corner_loss_only_car:
            gl_flat = gt_labels.reshape(-1)
            car = gl_flat[jnp.maximum(argmax, 0)] == 0
            cw = cw * car.astype(jnp.float32)
        loss_corner = jnp.sum(huber * cw) / jnp.maximum(cw.sum(), 1.0) * self.corner_loss_weight

        return {
            "loss_rcnn_cls": loss_cls,
            "loss_rcnn_bbox": loss_bbox,
            "loss_rcnn_corner": loss_corner,
            "num_pos_rois": is_pos.sum().astype(jnp.float32),
            "roi_membership_overflow": mem_overflow.astype(jnp.float32),
        }

    # -------------------------------------------------------------- testing

    def predict(self, pts_xyz, pts_feats, pts_valid, pts_batch, proposals,
                prop_scores, prop_labels, prop_valid, prop_batch,
                batch_size: int, nms_thr: float = 0.25, score_thr: float = 0.1,
                max_num: int = 500, use_rotate_nms: bool = True):
        cls_score, bbox_pred, nonempty, _ = self.pool_and_forward(
            pts_xyz, pts_feats, pts_valid, pts_batch,
            proposals[:, :7], prop_valid, prop_batch, False,
        )
        decoded = decode_rcnn(proposals[:, :7], bbox_pred)
        rcnn_scores = jax.nn.sigmoid(cls_score)
        valid = prop_valid & nonempty
        results = []
        for i in range(batch_size):
            m = valid & (prop_batch == i) & (prop_scores > score_thr)
            idx, sel_valid = topk_presort(prop_scores, m, min(max_num, decoded.shape[0]))
            keep = nms_bev(decoded[idx], prop_scores[idx], sel_valid, nms_thr,
                           use_rotate_nms)
            results.append({
                "boxes": decoded[idx],
                "scores": jnp.where(keep, rcnn_scores[idx], 0.0),
                "labels": prop_labels[idx],
                "valid": keep,
            })
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *results)

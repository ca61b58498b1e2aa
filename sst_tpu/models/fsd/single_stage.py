"""SingleStageFSD — the fully-sparse detector (FSD, NeurIPS 2022).

TPU rebuild of /root/reference/mmdet3d/models/detectors/single_stage_fsd.py:391
with the ClusterAssigner (:922) recast as device ops:

  VoteSegmentor → per-class fg selection (score threshold + static top-k
  compaction) → pre-voxelize dedup (0.1 m) → per-class cluster voxelization →
  device CCL over cluster-voxel centers → SIR backbone over (class, batch,
  cluster) groups → SparseClusterHeadV2.

Static-shape discipline: per-class fg caps, per-class cluster-voxel caps, and
per-class cluster caps replace boolean-mask compaction; selection is top-k by
score among thresholded points (identical to the reference whenever counts
fit the caps).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax import struct

from sst_tpu.core.target_assign import gt_point_class_labels
from sst_tpu.models.fsd.sir import SIR
from sst_tpu.models.fsd.sparse_cluster_head import SparseClusterHeadV2
from sst_tpu.models.fsd.vote_segmentor import VoteSegmentor, seg_targets
from sst_tpu.ops.ccl import compact_labels, connected_components, topk_compact
from sst_tpu.ops.segment import gather_segments, segment_reduce, unique_segments
from sst_tpu.ops.voxelize import grid_shape_zyx


@struct.dataclass
class FSDCaps:
    """Static capacities for the FSD pipeline."""

    fg_per_class: tuple = struct.field(pytree_node=False, default=(8192, 4096, 4096))
    cluster_voxels_per_class: tuple = struct.field(
        pytree_node=False, default=(4096, 4096, 4096)
    )
    clusters_per_class: tuple = struct.field(
        pytree_node=False, default=(512, 512, 512)
    )
    pre_voxels: int = struct.field(pytree_node=False, default=131072)


class SingleStageFSD(nn.Module):
    point_cloud_range: tuple = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)
    num_classes: int = 3
    class_names: tuple = ("Car", "Pedestrian", "Cyclist")
    # group_sample (single_stage_fsd.py:818, the Argo2 26-class recipe):
    # when set, sampling/clustering iterate over these class GROUPS instead
    # of classes — the segmentor head must then carry a background column
    # (num_classes + 1 logits, softmax scoring), a group's fg score is the
    # sum of its member-class probabilities, and its vote offset is the
    # logit-argmax member's offset ('max' offset weighting, :860-880). All
    # per-unit tuples below (score_thresh, cluster_voxel_size,
    # connected_dist, caps.*_per_class) are then indexed per group.
    group_names: tuple | None = None
    score_thresh: tuple = (0.3, 0.25, 0.25)
    cluster_voxel_size: tuple = ((0.3, 0.3, 6.0), (0.05, 0.05, 6.0), (0.2, 0.2, 6.0))
    connected_dist: tuple = (0.6, 0.1, 0.4)
    min_points: int = 2
    pre_voxelization_size: tuple | None = (0.1, 0.1, 0.1)
    add_gt_fg_points: bool = False  # train_cfg add_gt_fg_points (:776-796)
    # HybridAssigner (single_stage_fsd.py:1104): per-class choice between
    # CCL clustering ("ccl", the ClusterAssigner default) and key-point
    # assignment ("ssg", SSGAssigner :1002). None -> all "ccl".
    assigner_per_class: tuple | None = None
    ssg_radius: tuple = (1.0, 0.4, 0.6)
    ssg_num_fps: tuple = (256, 256, 256)
    caps: FSDCaps = struct.field(default_factory=FSDCaps)
    segmentor: dict = struct.field(default_factory=dict)
    backbone: dict = struct.field(default_factory=dict)
    head: dict = struct.field(default_factory=dict)
    test_cfg: dict = struct.field(
        default_factory=lambda: dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024,
                                     max_num=500, use_rotate_nms=True)
    )
    dtype: Any = jnp.float32

    @property
    def num_units(self) -> int:
        """Sampling/clustering units: class groups when group_names is set
        (Argo2), else one unit per class (Waymo)."""
        return (len(self.group_names) if self.group_names is not None
                else self.num_classes)

    def setup(self):
        for name in ("score_thresh", "cluster_voxel_size", "connected_dist"):
            if len(getattr(self, name)) < self.num_units:
                raise ValueError(
                    f"{name} has {len(getattr(self, name))} entries but "
                    f"{self.num_units} sampling units are configured")
        self.segmentor_mod = VoteSegmentor(
            point_cloud_range=self.point_cloud_range, dtype=self.dtype,
            **self.segmentor,
        )
        self.backbone_mod = SIR(dtype=self.dtype, **self.backbone)
        head_kw = {k: v for k, v in dict(self.head).items()
                   if k not in ("num_classes", "class_names")}
        if self.group_names is not None:
            head_kw.setdefault("tasks", self.group_names)
        self.head_mod = SparseClusterHeadV2(
            num_classes=self.num_classes, class_names=self.class_names,
            dtype=self.dtype, **head_kw,
        )

    # ------------------------------------------------------------- pipeline

    def pre_voxelize(self, data: dict, batch_size: int):
        """0.1 m dedup: average every float field over tiny voxels
        (single_stage_fsd.py:595)."""
        cap = self.caps.pre_voxels
        pts = data["seg_points"]
        vs = jnp.asarray(self.pre_voxelization_size, jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        c = jnp.floor((pts[:, :3] - pcr[None]) / vs[None]).astype(jnp.int32)
        grid = grid_shape_zyx(self.point_cloud_range, self.pre_voxelization_size)
        nz, ny, nx = grid
        key = ((data["batch_idx"] * nz + c[:, 2]) * ny + c[:, 1]) * nx + c[:, 0]
        uniq = unique_segments(key, data["valid"], cap)
        # ONE wide mean pass for every float field + batch_idx: scatter
        # reduces at ~200k rows are index-latency-bound (~3 ms each, nearly
        # width-independent), so 6 passes sharing seg ids fuse into 1.
        # batch_idx rides along as a float channel — the voxel key includes
        # the batch, so all rows of a segment share it and its mean IS it.
        names = ("seg_points", "seg_logits", "seg_vote_preds", "offsets",
                 "seg_feats")
        widths = [data[n].shape[-1] for n in names]
        wide = jnp.concatenate(
            [data[n] for n in names]
            + [data["batch_idx"].astype(jnp.float32)[:, None]], axis=-1)
        red = segment_reduce(wide, uniq.seg_ids, cap, "mean")
        out = {}
        ofs = 0
        for n, w in zip(names, widths):
            out[n] = red[:, ofs:ofs + w]
            ofs += w
        out["batch_idx"] = jnp.round(red[:, ofs]).astype(jnp.int32)
        out["valid"] = uniq.unique_keys != jnp.iinfo(jnp.int32).max
        return out

    def sample_class(self, data: dict, cls: int, thr_extra: float = 0.0):
        """fg selection for one sampling unit: threshold + top-k compaction
        (single_stage_fsd.py:698-775; group_sample :818 when group_names)."""
        cap = self.caps.fg_per_class[cls]
        if self.group_names is not None:
            ids = [self.class_names.index(n) for n in self.group_names[cls]]
            # background-column softmax scoring; group score = sum of member
            # probabilities (single_stage_fsd.py:828-845)
            probs = jax.nn.softmax(data["seg_logits"], axis=-1)
            scores = probs[:, jnp.asarray(ids)].sum(axis=-1)
        else:
            ids = [cls]
            scores = jax.nn.sigmoid(data["seg_logits"][:, cls])
        fg = data["valid"] & (scores > self.score_thresh[cls] + thr_extra)
        if data.get("gt_point_labels") is not None:
            member = jnp.zeros_like(fg)
            for cid in ids:
                member = member | (data["gt_point_labels"] == cid)
            fg = fg | (data["valid"] & member)
        idx, sel_valid = topk_compact(scores, fg, cap)
        pts = data["seg_points"][idx]
        offs = data["offsets"][idx].reshape(idx.shape[0], -1, 3)
        if len(ids) > 1:
            # 'max' offset weighting: the logit-argmax member's offset
            # (single_stage_fsd.py:860-880)
            member_logits = data["seg_logits"][idx][:, jnp.asarray(ids)]
            w = jax.nn.one_hot(member_logits.argmax(-1), len(ids))
            offsets = (offs[:, jnp.asarray(ids)] * w[..., None]).sum(axis=1)
        else:
            offsets = offs[:, ids[0]]
        centers = pts[:, :3] + offsets
        return {
            "idx": idx,
            "valid": sel_valid,
            "points": pts,
            "feats": jnp.concatenate(
                [data["seg_logits"][idx], data["seg_vote_preds"][idx],
                 data["seg_feats"][idx]], axis=-1,
            ),
            "centers": centers,
            "batch_idx": data["batch_idx"][idx],
        }

    def cluster_class(self, sample: dict, cls: int, batch_size: int):
        """Cluster voxelization + CCL for one class (ClusterAssigner
        single_stage_fsd.py:922-999). Returns per-point cluster slot in
        [0, clusters_per_class) and validity."""
        vcap = self.caps.cluster_voxels_per_class[cls]
        ccap = self.caps.clusters_per_class[cls]
        vsize = jnp.asarray(self.cluster_voxel_size[cls], jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        centers = sample["centers"]
        c = jnp.floor((centers - pcr[None, :3]) / vsize[None]).astype(jnp.int32)
        nx = int(round((self.point_cloud_range[3] - self.point_cloud_range[0])
                       / self.cluster_voxel_size[cls][0])) + 2
        ny = int(round((self.point_cloud_range[4] - self.point_cloud_range[1])
                       / self.cluster_voxel_size[cls][1])) + 2
        # clusters use xy mostly (z voxel is full height); clip for safety
        cx = jnp.clip(c[:, 0], 0, nx - 1)
        cy = jnp.clip(c[:, 1], 0, ny - 1)
        key = (sample["batch_idx"] * ny + cy) * nx + cx
        uniq = unique_segments(key, sample["valid"], vcap)
        counts_pp = uniq.counts[jnp.minimum(uniq.seg_ids, vcap - 1)]
        pt_valid = sample["valid"] & (counts_pp >= self.min_points) & (uniq.seg_ids < vcap)
        vox_valid = (uniq.unique_keys != jnp.iinfo(jnp.int32).max) & (
            uniq.counts >= self.min_points
        )
        # one fused pass: centers mean + batch (same-value mean — the key
        # includes the batch)
        wide = jnp.concatenate(
            [centers, sample["batch_idx"].astype(jnp.float32)[:, None]], -1)
        red = segment_reduce(wide, uniq.seg_ids, vcap, "mean")
        vox_centers = red[:, :3]
        vox_batch = jnp.round(red[:, 3]).astype(jnp.int32)
        labels = connected_components(
            vox_centers[:, :2], vox_batch, vox_valid, self.connected_dist[cls]
        )
        comp_ids, _ = compact_labels(labels, vox_valid, ccap)
        # per-point cluster slot
        pt_cluster = jnp.where(
            pt_valid,
            comp_ids[jnp.minimum(uniq.seg_ids, vcap - 1)],
            ccap,
        )
        pt_valid = pt_valid & (pt_cluster < ccap)
        return pt_cluster, pt_valid

    def ssg_class(self, sample: dict, cls: int, batch_size: int):
        """SSGAssigner (single_stage_fsd.py:1002): voxelize vote centers, FPS
        key points, drop any key point within 2·radius of an earlier one,
        then assign each voxel to the (unique) key point within radius.
        Same (per-point cluster slot, validity) contract as cluster_class."""
        from sst_tpu.ops.fps import furthest_point_sample

        vcap = self.caps.cluster_voxels_per_class[cls]
        ccap = self.caps.clusters_per_class[cls]
        radius = self.ssg_radius[cls]
        vsize = jnp.asarray(self.cluster_voxel_size[cls], jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        centers = sample["centers"]
        c = jnp.floor((centers - pcr[None, :3]) / vsize[None]).astype(jnp.int32)
        nx = int(round((self.point_cloud_range[3] - self.point_cloud_range[0])
                       / self.cluster_voxel_size[cls][0])) + 2
        ny = int(round((self.point_cloud_range[4] - self.point_cloud_range[1])
                       / self.cluster_voxel_size[cls][1])) + 2
        cx = jnp.clip(c[:, 0], 0, nx - 1)
        cy = jnp.clip(c[:, 1], 0, ny - 1)
        key = (sample["batch_idx"] * ny + cy) * nx + cx
        uniq = unique_segments(key, sample["valid"], vcap)
        vox_valid = uniq.unique_keys != jnp.iinfo(jnp.int32).max
        wide = jnp.concatenate(
            [centers, sample["batch_idx"].astype(jnp.float32)[:, None]], -1)
        red = segment_reduce(wide, uniq.seg_ids, vcap, "mean")
        vox_centers = red[:, :3]
        vox_batch = jnp.round(red[:, 3]).astype(jnp.int32)

        # batch-offset x so FPS spread / radius tests never cross samples
        off = vox_batch.astype(jnp.float32) * 1e4
        xy = jnp.stack([vox_centers[:, 0] + off, vox_centers[:, 1],
                        jnp.zeros_like(off)], -1)
        k = min(int(self.ssg_num_fps[cls]), ccap)
        kidx, kok = furthest_point_sample(xy, vox_valid, k)
        kp = xy[kidx, :2]  # [K, 2]
        # suppress key points within 2r of an EARLIER key point (:1066-1073)
        kd = jnp.linalg.norm(kp[:, None] - kp[None, :], axis=-1)
        earlier = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :]) & \
            kok[:, None] & kok[None, :]
        kvalid = kok & ~((kd < 2 * radius + 0.01) & earlier).any(axis=0)

        dmat = jnp.linalg.norm(xy[:, None, :2] - kp[None, :, :], axis=-1)
        dmat = jnp.where(kvalid[None, :], dmat, jnp.inf)
        nearest = jnp.argmin(dmat, axis=1).astype(jnp.int32)
        assigned = vox_valid & (jnp.min(dmat, axis=1) < radius)
        vox_cluster = jnp.where(assigned, nearest, ccap)
        # points whose voxel overflowed vcap must be dropped, not aliased to
        # the last real voxel's cluster (matches cluster_class overflow
        # semantics)
        in_cap = uniq.seg_ids < vcap
        pt_cluster = jnp.where(
            sample["valid"] & in_cap,
            vox_cluster[jnp.minimum(uniq.seg_ids, vcap - 1)], ccap,
        )
        return pt_cluster, sample["valid"] & in_cap & (pt_cluster < ccap)

    def extract(self, data: dict, batch_size: int, train: bool,
                thr_extra: float = 0.0):
        """sample → cluster → SIR for all classes. Returns cluster-level and
        point-level tensors."""
        streams = []
        total_clusters = sum(self.caps.clusters_per_class[:self.num_units])
        offset = 0
        for cls in range(self.num_units):
            s = self.sample_class(data, cls, thr_extra)
            kind = (self.assigner_per_class or ("ccl",) * self.num_units)[cls]
            assign = self.ssg_class if kind == "ssg" else self.cluster_class
            pc, pv = assign(s, cls, batch_size)
            ccap = self.caps.clusters_per_class[cls]
            seg = jnp.where(pv, pc + offset, total_clusters)
            streams.append((s, seg, pv))
            offset += ccap

        points = jnp.concatenate([s["points"] for s, _, _ in streams])
        feats = jnp.concatenate([s["feats"] for s, _, _ in streams])
        centers = jnp.concatenate([s["centers"] for s, _, _ in streams])
        batch_idx = jnp.concatenate([s["batch_idx"] for s, _, _ in streams])
        seg_ids = jnp.concatenate([sg for _, sg, _ in streams])
        pt_valid = jnp.concatenate([pv for _, _, pv in streams])

        # one fused sum pass: xyz mean (sum/count), batch (same-value),
        # valid (count > 0) — 3 scatters sharing seg ids become 1
        wide = jnp.concatenate(
            [centers, batch_idx.astype(jnp.float32)[:, None],
             jnp.ones((centers.shape[0], 1), jnp.float32)], -1)
        red = segment_reduce(wide, seg_ids, total_clusters, "sum")
        cnt = jnp.maximum(red[:, 4], 1.0)
        cluster_xyz = red[:, :3] / cnt[:, None]
        cluster_batch = jnp.round(red[:, 3] / cnt).astype(jnp.int32)
        # unit index == head task index (1:1 with classes on Waymo; class
        # groups on Argo2)
        cluster_cls = jnp.concatenate([
            jnp.full((self.caps.clusters_per_class[c],), c, jnp.int32)
            for c in range(self.num_units)
        ])
        cluster_valid = red[:, 4] > 0  # rows with seg==total_clusters drop

        f_cluster = points[:, :3] - gather_segments(cluster_xyz, seg_ids)
        pt_feats, cluster_feats = self.backbone_mod(
            points, feats, f_cluster, seg_ids, total_clusters, pt_valid, train
        )
        return {
            "cluster_feats": cluster_feats,
            "cluster_xyz": cluster_xyz,
            "cluster_batch": cluster_batch,
            "cluster_cls": cluster_cls,
            "cluster_valid": cluster_valid,
            "pt_feats": pt_feats,
            "points": points,
            "pt_seg_ids": seg_ids,
            "pt_valid": pt_valid,
            "pt_batch_idx": batch_idx,
            "pt_idx": jnp.concatenate([s["idx"] for s, _, _ in streams]),
        }

    # ------------------------------------------------------------- pipeline

    def run_pipeline(self, batch, train: bool, thr_extra: float = 0.0,
                     detach_seg: bool = True):
        """Segmentor → sample/cluster → SIR → head outputs. Returns every
        intermediate needed by losses, prediction and the RoI stage."""
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        seg_out = self.segmentor_mod(pts, batch_idx, batch.valid.reshape(-1),
                                     b, train)
        data = {k: seg_out[k] for k in ("seg_points", "seg_logits",
                                        "seg_vote_preds", "offsets",
                                        "seg_feats", "batch_idx", "valid")}
        if detach_seg:
            data["seg_logits"] = jax.lax.stop_gradient(data["seg_logits"])
            data["seg_vote_preds"] = jax.lax.stop_gradient(data["seg_vote_preds"])
            data["offsets"] = jax.lax.stop_gradient(data["offsets"])
        if self.pre_voxelization_size is not None:
            data = self.pre_voxelize(data, b)
        if train and self.add_gt_fg_points:
            # recover segmentation misses inside gt boxes (single_stage_fsd
            # .py:776-796), computed on the (possibly pre-voxelized) points
            data["gt_point_labels"] = gt_point_class_labels(
                data["seg_points"][:, :3], data["batch_idx"], data["valid"],
                batch.gt_boxes, batch.gt_labels, batch.gt_valid,
            )
        ex = self.extract(data, b, train, thr_extra)
        outs = self.head_mod(ex["cluster_feats"], ex["cluster_valid"], train)
        return {"seg_out": seg_out, "data": data, "ex": ex, "outs": outs,
                "batch_size": b}

    # ------------------------------------------------------------- training

    def seg_losses(self, batch, seg_out):
        def tgt_single(points_s, valid_s, boxes_s, labels_s, gv_s):
            return seg_targets(points_s[:, :3], valid_s, boxes_s, labels_s,
                               gv_s, self.num_classes)

        lbl, vt, vm = jax.vmap(tgt_single)(
            batch.points, batch.valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid,
        )
        return self.segmentor_mod.head_mod.losses(
            seg_out["seg_logits"], seg_out["seg_vote_preds"],
            lbl.reshape(-1), vt.reshape(-1, 3), vm.reshape(-1), seg_out["valid"],
        )

    def losses_from_pipeline(self, batch, pipe):
        losses = self.seg_losses(batch, pipe["seg_out"])
        ex = pipe["ex"]
        det_losses = self.head_mod.loss(
            pipe["outs"], ex["cluster_xyz"], ex["cluster_batch"],
            ex["cluster_valid"], batch.gt_boxes, batch.gt_labels, batch.gt_valid,
        )
        losses.update(det_losses)
        losses["num_clusters"] = ex["cluster_valid"].sum().astype(jnp.float32)
        losses["num_fg_points"] = ex["pt_valid"].sum().astype(jnp.float32)
        return losses

    def loss(self, batch, train: bool = True, thr_extra: float = 0.0,
             pretrain: bool = False):
        """pretrain=True: segmentation-only warmup (EnableFSDDetectionHook
        fsd_hooks.py:70 before enable; also the standalone segmentation
        pretrain recipe, configs/argo2/argo_segmentation_pretrain.py)."""
        if pretrain:
            b, p, _ = batch.points.shape
            pts = batch.points.reshape(b * p, -1)
            batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
            seg_out = self.segmentor_mod(
                pts, batch_idx, batch.valid.reshape(-1), b, train)
            return self.seg_losses(batch, seg_out)
        pipe = self.run_pipeline(batch, train, thr_extra)
        return self.losses_from_pipeline(batch, pipe)

    def predict_seg(self, batch, score_thr: float = 0.5):
        """Per-point semantic predictions + box-derived gt labels for the
        seg-eval protocol (core/eval_seg.py; reference
        mmdet3d/core/evaluation/seg_eval.py:69). The decode rule is
        argmax over per-class sigmoid scores, background (= num_classes)
        when the max score is below ``score_thr`` — the multi-label focal
        head has no explicit bg logit. gt comes from the same
        enlarged-gt-box containment rule the seg loss trains against
        (segmentation_head.py:212).

        Returns dict(pred [B, P], gt [B, P] — both int32 with bg =
        num_classes — and valid [B, P])."""
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        seg_out = self.segmentor_mod(
            pts, batch_idx, batch.valid.reshape(-1), b, False)
        scores = jax.nn.sigmoid(seg_out["seg_logits"])  # [B*P, C]
        pred = jnp.where(scores.max(axis=-1) >= score_thr,
                         scores.argmax(axis=-1), self.num_classes)

        def tgt_single(points_s, valid_s, boxes_s, labels_s, gv_s):
            return seg_targets(points_s[:, :3], valid_s, boxes_s, labels_s,
                               gv_s, self.num_classes)[0]

        gt = jax.vmap(tgt_single)(
            batch.points, batch.valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid,
        )
        return {
            "pred": pred.astype(jnp.int32).reshape(b, p),
            "gt": gt.astype(jnp.int32).reshape(b, p),
            "valid": batch.valid,
        }

    def predict(self, batch):
        pipe = self.run_pipeline(batch, train=False, detach_seg=False)
        ex = pipe["ex"]
        return self.head_mod.get_bboxes(
            pipe["outs"], ex["cluster_xyz"], ex["cluster_batch"],
            ex["cluster_valid"], pipe["batch_size"], **self.test_cfg,
        )

    def __call__(self, batch, train: bool = False):
        """Init-friendly entry: runs the full pipeline to head outputs."""
        return self.run_pipeline(batch, train)["outs"]

"""FSD++ — super-sparse incremental multi-frame detector (TPAMI 2023).

TPU rebuild of /root/reference/mmdet3d/models/detectors/two_stage_fsdpp.py:37:
the network only consumes (a) *residual* points of the current frame — points
whose voxel was empty in the previous frames — and (b) previous-frame points
cropped inside propagated seed boxes (last frame's detections). Everything
else (the static background already seen) is dropped before the FSD pipeline.

TPU shape discipline: the multi-frame cloud stays a fixed [B, P, C] array;
"dropping" is a validity-mask intersection (generate_points two_stage_fsdpp
.py:660-737 builds ragged lists instead). Seed preprocessing
(modify_previous_boxes :763-800: score filter, train-time box noise,
class-wise enlargement) is mask-based too.

On IncrementalROIHead (roi_heads/incremental_roi_head.py:21): its
TrajGenerator / TrajFeatureExtractor / TrajFeatureAggregator classes are
referenced but defined nowhere in the reference repo — the head cannot be
instantiated upstream (unreleased component). The shipped FSD++ configs run
the standard GroupCorrectionHead, which is exactly what this detector's
second stage uses.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.core.boxes import points_in_boxes
from sst_tpu.models.detectors.dynamic_voxelnet import PointBatch
from sst_tpu.models.fsd.two_stage import FSD
from sst_tpu.ops.ccl import topk_compact
from sst_tpu.ops.fps import group_fps_mask
from sst_tpu.ops.incremental import delta_points_mask
from sst_tpu.ops.segment import INT_SENTINEL, unique_segments


@struct.dataclass
class TemporalBatch:
    """Multi-frame input, pose-aligned to the current ego frame host-side.

    frame_inds: 0 = current frame, k>0 = k frames ago.
    seed_*: previous round's detections (offline bins or sequential reuse),
    already transformed into the current frame."""

    points: jax.Array  # [B, P, C]
    valid: jax.Array  # [B, P]
    frame_inds: jax.Array  # [B, P] int32
    gt_boxes: jax.Array  # [B, G, 7+]
    gt_labels: jax.Array  # [B, G]
    gt_valid: jax.Array  # [B, G]
    seed_boxes: jax.Array  # [B, S, 7]
    seed_labels: jax.Array  # [B, S]
    seed_scores: jax.Array  # [B, S]
    seed_valid: jax.Array  # [B, S]


class TwoStageFSDPP(nn.Module):
    fsd: dict = struct.field(default_factory=dict)
    # incremental_cfg (two_stage_fsdpp.py:77, configs/fsdpp):
    inc_voxel_size: tuple = (0.4, 0.4, 0.4)
    point_cloud_range: tuple = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)
    extra_width: tuple = (0.5, 0.5, 0.5)  # per-class seed enlargement (w l h)
    pre_score_thr: float = 0.3
    center_noise: float = 0.0
    dim_noise: float = 0.0
    yaw_noise: float = 0.0
    # train-time seed augmentation (two_stage_fsdpp.py:843-844):
    fp_rate: float | None = None  # random FP insertion (:860-884)
    seed_drop_rate: float | None = None  # random seed dropping (:899-941)
    # previous-point crop subsampling (crop_and_process_points :637-679);
    # at most one of the two. Ours caps per seed box across all previous
    # frames (the reference caps per (frame, box); with a merged seed set a
    # single budget is equivalent discipline).
    max_crop_points: int | None = None  # first-K rank trim (:658-672)
    n_fps: int | None = None  # torchex group_fps (:671)
    frame_id_scale: float = 0.1  # hard-coded /10 (two_stage_fsdpp.py:721)
    # TPU residual compaction: after the residual/crop mask, gather the
    # surviving points into a [B, residual_points_cap, C] buffer so the FSD
    # pipeline's compute scales with the RESIDUAL workload, not the raw
    # multi-frame cap — this is where FSD++'s super-sparsity actually pays
    # on static shapes (reference drops rows from ragged lists instead,
    # generate_points :660-737). 0 = no compaction (full buffer flows
    # through with valid=False rows). Overflow beyond the cap keeps the
    # lowest point indices; surface via num_residual_overflow in losses.
    residual_points_cap: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        self.fsd_mod = FSD(dtype=self.dtype, **self.fsd)

    # --------------------------------------------------------------- seeds

    def _fp_insertion(self, boxes, labels, scores, valid, rng):
        """Duplicate a random subset of seeds into empty slots, shifted by
        U(-10, 10) m in xy (two_stage_fsdpp.py:860-884) — simulates false
        positives so the rcnn learns to kill them."""
        b, s = valid.shape
        k1, k2 = jax.random.split(rng)
        cand = valid & (jax.random.uniform(k1, (b, s)) < self.fp_rate)
        shift = (jax.random.uniform(k2, (b, s, 2)) - 0.5) * 20.0

        def per(bx, lb, sc, va, cd, sh):
            cidx, cok = topk_compact(jnp.ones((s,)), cd, s)
            eidx, eok = topk_compact(jnp.ones((s,)), ~va, s)
            place = cok & eok
            dst = jnp.where(place, eidx, s)
            moved = bx[cidx].at[:, :2].add(sh[cidx])
            return (bx.at[dst].set(moved, mode="drop"),
                    lb.at[dst].set(lb[cidx], mode="drop"),
                    sc.at[dst].set(sc[cidx], mode="drop"),
                    va.at[dst].set(place, mode="drop"))

        return jax.vmap(per)(boxes, labels, scores, valid, cand, shift)

    def preprocess_seeds(self, batch: TemporalBatch, train: bool, rng=None):
        boxes = batch.seed_boxes
        labels = batch.seed_labels
        scores = batch.seed_scores
        valid = batch.seed_valid & (batch.seed_scores > self.pre_score_thr)
        if train and rng is not None:
            rng, kfp, kdrop = jax.random.split(rng, 3)
            if self.seed_drop_rate:
                # single merged seed set → track-consistent dropping reduces
                # to one Bernoulli mask (ref :899-941 propagates the base
                # frame's mask across frames by IoU matching)
                valid = valid & (
                    jax.random.uniform(kdrop, valid.shape) > self.seed_drop_rate
                )
            if self.fp_rate:
                boxes, labels, scores, valid = self._fp_insertion(
                    boxes, labels, scores, valid, kfp
                )
        if train and rng is not None and (
            self.center_noise > 0 or self.dim_noise > 0 or self.yaw_noise > 0
        ):
            kc, kd, ky = jax.random.split(rng, 3)
            noise_c = jax.random.normal(kc, boxes[..., :3].shape) * self.center_noise
            noise_d = jax.random.normal(kd, boxes[..., 3:6].shape) * self.dim_noise
            noise_y = jax.random.normal(ky, boxes[..., 6:7].shape) * self.yaw_noise
            boxes = jnp.concatenate(
                [boxes[..., :3] + noise_c, boxes[..., 3:6] + noise_d,
                 boxes[..., 6:7] + noise_y], axis=-1,
            )
        ew = jnp.asarray(self.extra_width, jnp.float32)
        labels = jnp.clip(labels, 0, len(self.extra_width) - 1)
        # class-wise symmetric enlargement (lidar_box3d.py classwise_enlarged)
        grow = ew[labels][..., None] * jnp.ones((1, 1, 3))
        enlarged = jnp.concatenate(
            [boxes[..., :2], boxes[..., 2:3] - grow[..., :1] / 2,
             boxes[..., 3:6] + grow, boxes[..., 6:7]], axis=-1,
        )
        return boxes, enlarged, valid

    # ---------------------------------------------------------- point select

    def generate_point_mask(self, batch: TemporalBatch, enlarged_seeds,
                            seed_valid):
        """keep = (current & residual-vs-previous) | (previous & in-seed-box)
        (two_stage_fsdpp.py generate_points + crop_and_process_points)."""
        def per_sample(pts, valid, finds, seeds, sv):
            xyz = pts[:, :3]
            cur = finds == 0
            prev = (finds > 0) & valid
            delta = delta_points_mask(
                xyz, valid & cur, xyz, prev,
                self.point_cloud_range, self.inc_voxel_size,
            )
            inb = points_in_boxes(xyz, seeds) & sv[None, :]  # [P, S]
            in_seed = inb.any(axis=1)
            crop = prev & in_seed
            if self.max_crop_points or self.n_fps:
                s = seeds.shape[0]
                box_id = jnp.argmax(inb, axis=1).astype(jnp.int32)
                if self.max_crop_points:
                    # first-K per seed box (crop_and_process_points :658-668)
                    uu = unique_segments(
                        jnp.where(crop, box_id, INT_SENTINEL), crop, s
                    )
                    crop = crop & (uu.ranks < self.max_crop_points)
                else:
                    # per-box farthest point sampling (torchex group_fps :671)
                    crop = group_fps_mask(xyz, box_id, crop, s, self.n_fps)
            return (cur & valid & delta) | crop

        return jax.vmap(per_sample)(
            batch.points, batch.valid, batch.frame_inds, enlarged_seeds,
            seed_valid,
        )

    def to_point_batch(self, batch: TemporalBatch, train: bool, rng=None):
        _, enlarged, sv = self.preprocess_seeds(batch, train, rng)
        keep = self.generate_point_mask(batch, enlarged, sv)
        # frame-age channel, 0 for current (two_stage_fsdpp.py:721)
        age = -batch.frame_inds.astype(jnp.float32) * self.frame_id_scale
        pts = jnp.concatenate([batch.points, age[..., None]], axis=-1)
        overflow = jnp.zeros((), jnp.float32)
        if self.residual_points_cap:
            cap = self.residual_points_cap
            p = pts.shape[1]
            overflow = jnp.maximum(
                keep.sum(axis=1) - cap, 0).sum().astype(jnp.float32)

            def compact(pt, kp):
                # earliest-index survivors (stable: current-frame points
                # come first in the assembled buffer)
                idx, ok = topk_compact(
                    -jnp.arange(p, dtype=jnp.float32), kp, cap)
                return pt[idx], ok

            pts, keep = jax.vmap(compact)(pts, keep)
        return PointBatch(
            points=pts, valid=keep, gt_boxes=batch.gt_boxes,
            gt_labels=batch.gt_labels, gt_valid=batch.gt_valid,
        ), overflow

    # ---------------------------------------------------------------- wiring

    def loss(self, batch: TemporalBatch, train: bool = True,
             thr_extra: float = 0.0):
        rng = self.make_rng("seeds") if train and (
            self.center_noise > 0 or self.dim_noise > 0 or self.yaw_noise > 0
            or self.fp_rate or self.seed_drop_rate
        ) else None
        pb, overflow = self.to_point_batch(batch, train, rng)
        losses = self.fsd_mod.loss(pb, train, thr_extra)
        losses["num_input_points"] = pb.valid.sum().astype(jnp.float32)
        losses["num_residual_overflow"] = overflow
        return losses

    def predict(self, batch: TemporalBatch, skip_rcnn: bool = False):
        pb, _ = self.to_point_batch(batch, train=False)
        return self.fsd_mod.predict(pb, skip_rcnn=skip_rcnn)

    def __call__(self, batch: TemporalBatch, train: bool = False):
        pb, _ = self.to_point_batch(batch, train)
        return self.fsd_mod(pb, train)

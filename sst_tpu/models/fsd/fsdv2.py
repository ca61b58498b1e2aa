"""FSDv2 — virtual-voxel fully-sparse detector (arXiv 2308.03755).

TPU rebuild of /root/reference/mmdet3d/models/detectors/single_stage_fsd_v2.py:37
(SingleStageFSDV2), two_stage_fsd_v2.py:11 (FSDV2) and dense_heads/fsd_v2_head.py:18
(FSDV2Head — structurally SparseClusterHeadV2 over virtual-voxel centers, which we
reuse directly).

Pipeline (no clustering / CCL — fully parallel, the best TPU fit):
  VoteSegmentor (multiscale) → per-class fg sampling (threshold + static top-k)
  → virtual points = vote-shifted centers with `virtual_proj` features; real
  points with `ori_proj` features → union voxelized at `virtual_voxel_size`
  → DynamicVFE → multiscale fusion (UNet decoder feats projected onto the
  virtual grid, segment-mean union) → VirtualVoxelMixer sparse UNet →
  virtual-voxel compaction (static cap) → FSDV2 head.

Static-shape discipline mirrors single_stage.py: per-class fg caps, a virtual
voxel cap, a fused-union cap, and a compacted virtual-voxel cap for the head.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from sst_tpu.core.box_coders import base_point_decode
from sst_tpu.core.target_assign import gt_fg_points_mask, gt_point_class_labels
from sst_tpu.models.dense_bev import DenseBEVMixer
from sst_tpu.models.fsd.roi_head import GroupCorrectionHead
from sst_tpu.models.fsd.sparse_cluster_head import SparseClusterHeadV2
from sst_tpu.models.fsd.vote_segmentor import VoteSegmentor, seg_targets
from sst_tpu.models.layers import MLP
from sst_tpu.models.sparse_unet import VirtualVoxelMixer, build_unet_plan
from sst_tpu.models.vfe import DynamicVFE
from sst_tpu.ops.ccl import topk_compact
from sst_tpu.ops.segment import (
    INT_SENTINEL,
    gather_segments,
    segment_reduce,
    unique_segments,
)
from sst_tpu.ops.sparse_conv import SparseGrid
from sst_tpu.ops.voxelize import (
    delinearize_key,
    dynamic_voxelize,
    grid_shape_zyx,
    linearize_coords,
)


@struct.dataclass
class FSDV2Caps:
    """Static capacities for the FSDv2 pipeline."""

    fg_per_class: tuple = struct.field(pytree_node=False, default=(8192, 4096, 4096))
    voxels: int = struct.field(pytree_node=False, default=32768)
    union_voxels: int = struct.field(pytree_node=False, default=49152)
    virtual_out: int = struct.field(pytree_node=False, default=8192)


class SingleStageFSDV2(nn.Module):
    point_cloud_range: tuple = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)
    virtual_voxel_size: tuple = (0.5, 0.5, 0.5)
    num_classes: int = 3
    class_names: tuple = ("Car", "Pedestrian", "Cyclist")
    score_thresh: tuple = (0.3, 0.25, 0.25)
    # batched_group_sample (nuScenes): when set, the segmentor must output
    # num_classes+1 logits (background column) and score_thresh is per GROUP.
    group_names: tuple | None = None
    group_offset_scale: float = 1.0
    offset_normalizer: float = 10.0  # single_stage_fsd_v2.py:175 "hardcode"
    proj_hidden: tuple = (64, 64)
    # multiscale fusion: indices into the segmentor UNet decoder feature list
    # (deepest-first) + per-level projector hidden dims.
    multiscale_levels: tuple = (0, 1)
    ms_projector_hiddens: tuple = ((128,), (128,))
    ms_output_dim: int = 128
    # mixer_type="sparse": reference VirtualVoxelMixer (sparse UNet).
    # mixer_type="dense_bev": TPU-native z-sliced dense mixer (dense_bev.py),
    # used with a dense_bev segmentor backbone for the flagship fast path.
    mixer_type: str = "sparse"
    mixer_strides: tuple = ((2, 2, 2), (2, 2, 2))
    mixer_paddings: tuple = ((1, 1, 1), (1, 1, 1))
    centroid_alpha: float | None = None
    add_gt_fg_points: bool = False  # train_cfg.get('add_gt_fg_points')
    caps: FSDV2Caps = struct.field(default_factory=FSDV2Caps)
    segmentor: dict = struct.field(default_factory=dict)
    vfe: dict = struct.field(
        default_factory=lambda: dict(feat_channels=(64, 128), mode="max")
    )
    mixer: dict = struct.field(default_factory=dict)
    head: dict = struct.field(
        default_factory=lambda: dict(in_channel=128, shared_mlp_dims=(256, 256))
    )
    as_rpn: bool = False
    test_cfg: dict = struct.field(
        default_factory=lambda: dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024,
                                     max_num=500, use_rotate_nms=True)
    )
    dtype: Any = jnp.float32

    def setup(self):
        n_groups = (len(self.group_names) if self.group_names is not None
                    else self.num_classes)
        if len(self.caps.fg_per_class) < n_groups:
            raise ValueError(
                f"caps.fg_per_class has {len(self.caps.fg_per_class)} entries "
                f"but {n_groups} sampling groups are configured — provide one "
                "fg cap per group")
        self.segmentor_mod = VoteSegmentor(
            point_cloud_range=self.point_cloud_range, return_multiscale=True,
            dtype=self.dtype, **self.segmentor,
        )
        self.vfe_mod = DynamicVFE(
            voxel_size=self.virtual_voxel_size,
            point_cloud_range=self.point_cloud_range,
            dtype=self.dtype, **self.vfe,
        )
        if self.mixer_type == "dense_bev":
            vgrid = grid_shape_zyx(self.point_cloud_range,
                                   self.virtual_voxel_size)
            self.mixer_mod = DenseBEVMixer(nz=vgrid[0], dtype=self.dtype,
                                           **self.mixer)
        else:
            self.mixer_mod = VirtualVoxelMixer(dtype=self.dtype, **self.mixer)
        # configs may repeat num_classes/class_names/tasks inside the head
        # dict (the reference writes them in both places); the model-level
        # values win for the first two, tasks stays a head-level choice
        head_kw = {k: v for k, v in dict(self.head).items()
                   if k not in ("num_classes", "class_names")}
        self.head_mod = SparseClusterHeadV2(
            num_classes=self.num_classes, class_names=self.class_names,
            dtype=self.dtype, **head_kw,
        )
        self.virtual_proj = MLP(self.proj_hidden, norm="ln", dtype=self.dtype)
        self.ori_proj = MLP(self.proj_hidden, norm="ln", dtype=self.dtype)
        self.ms_projs = [
            MLP(tuple(h) + (self.ms_output_dim,), norm="ln", dtype=self.dtype)
            for h in self.ms_projector_hiddens
        ]
        if self.as_rpn:
            self.recover_proj = MLP((128, 128), norm="ln", dtype=self.dtype)

    # --------------------------------------------------------------- sampling

    def _clip(self, xyz):
        pcr = self.point_cloud_range
        eps = 1e-5
        return jnp.stack(
            [jnp.clip(xyz[:, i], pcr[i] + eps, pcr[i + 3] - eps) for i in range(3)],
            axis=-1,
        )

    def sample_class(self, data: dict, cls: int, thr_extra: float = 0.0,
                     pretrain: bool = False):
        """fg selection for one class (single_stage_fsd_v2.py:601-650):
        threshold + top-k compaction; `pretrain` = disable_pretrain mode
        (top-k by score with no threshold, :667-675)."""
        cap = self.caps.fg_per_class[cls]
        scores = jax.nn.sigmoid(data["seg_logits"][:, cls])
        if pretrain:
            fg = data["valid"]
        else:
            fg = data["valid"] & (scores > self.score_thresh[cls] + thr_extra)
            if data.get("gt_point_labels") is not None:
                # add_gt_fg_points (single_stage_fsd.py:776-796): recover
                # segmentation misses inside same-class gt boxes at train time
                fg = fg | (data["valid"] & (data["gt_point_labels"] == cls))
        idx, sel_valid = topk_compact(scores, fg, cap)
        pts = data["seg_points"][idx]
        offsets = data["offsets"][idx].reshape(-1, self.num_classes, 3)[:, cls]
        centers = self._clip(pts[:, :3] + offsets)
        # virtual point feature input (single_stage_fsd_v2.py:174-177):
        # [seg_feats, offset/10, seg_logits, raw extra dims]
        proj_in = jnp.concatenate(
            [data["seg_feats"][idx],
             (centers - pts[:, :3]) / self.offset_normalizer,
             data["seg_logits"][idx], pts[:, 3:]], axis=-1,
        )
        return {
            "valid": sel_valid,
            "centers": centers,
            "proj_in": proj_in,
            "batch_idx": data["batch_idx"][idx],
        }

    def sample_group(self, data: dict, gi: int, thr_extra: float = 0.0,
                     pretrain: bool = False):
        """batched_group_sample (single_stage_fsd_v2.py:790-860, nuScenes):
        the seg head carries a background column (num_classes + 1 softmax);
        a group's fg score is the sum of its member-class probabilities and
        its vote offset is the logit-argmax member's offset ('max' offset
        weighting, :836-841)."""
        names = self.group_names[gi]
        ids = [self.class_names.index(n) for n in names]
        cap = self.caps.fg_per_class[gi]  # one cap per group (setup-checked)
        probs = jax.nn.softmax(data["seg_logits"], axis=-1)  # incl. background
        gscore = probs[:, jnp.asarray(ids)].sum(axis=-1)
        if pretrain:
            fg = data["valid"]
        else:
            fg = data["valid"] & (gscore > self.score_thresh[gi] + thr_extra)
            if data.get("gt_point_labels") is not None:
                member = jnp.zeros_like(fg)
                for cid in ids:
                    member = member | (data["gt_point_labels"] == cid)
                fg = fg | (data["valid"] & member)
        idx, sel_valid = topk_compact(gscore, fg, cap)
        pts = data["seg_points"][idx]
        member_logits = data["seg_logits"][idx][:, jnp.asarray(ids)]
        w = jax.nn.one_hot(member_logits.argmax(-1), len(ids))
        offs = data["offsets"][idx].reshape(
            idx.shape[0], -1, 3)[:, jnp.asarray(ids)]
        offset = (offs * w[..., None]).sum(axis=1) * self.group_offset_scale
        centers = self._clip(pts[:, :3] + offset)
        proj_in = jnp.concatenate(
            [data["seg_feats"][idx],
             (centers - pts[:, :3]) / self.offset_normalizer,
             data["seg_logits"][idx], pts[:, 3:]], axis=-1,
        )
        return {
            "valid": sel_valid,
            "centers": centers,
            "proj_in": proj_in,
            "batch_idx": data["batch_idx"][idx],
        }

    # ----------------------------------------------------------- feature path

    def extract_feat(self, data: dict, batch_size: int, train: bool,
                     thr_extra: float = 0.0, pretrain: bool = False):
        caps = self.caps
        # --- virtual points (vote-shifted centers), per class (or per group
        # with the nuScenes batched_group_sample recipe)
        if self.group_names is not None:
            samples = [
                self.sample_group(data, g, thr_extra, pretrain)
                for g in range(len(self.group_names))
            ]
        else:
            samples = [
                self.sample_class(data, c, thr_extra, pretrain)
                for c in range(self.num_classes)
            ]
        vir_xyz = jnp.concatenate([s["centers"] for s in samples])
        vir_in = jnp.concatenate([s["proj_in"] for s in samples])
        vir_valid = jnp.concatenate([s["valid"] for s in samples])
        vir_batch = jnp.concatenate([s["batch_idx"] for s in samples])
        vir_feat = self.virtual_proj(vir_in, vir_valid, train)

        # --- real points
        ori_xyz = data["seg_points"][:, :3]
        ori_feat = self.ori_proj(data["seg_feats"], data["valid"], train)

        cat_xyz = jnp.concatenate([ori_xyz, vir_xyz])
        cat_feat = jnp.concatenate([ori_feat, vir_feat])
        cat_batch = jnp.concatenate([data["batch_idx"], vir_batch])
        cat_valid = jnp.concatenate([data["valid"], vir_valid])
        indicator = jnp.concatenate(
            [jnp.zeros(ori_xyz.shape[0], jnp.float32),
             jnp.ones(vir_xyz.shape[0], jnp.float32)]
        )

        # --- virtual-grid voxelization + VFE
        vfe_in = jnp.concatenate([cat_xyz, cat_feat], axis=-1)
        vm = dynamic_voxelize(
            vfe_in, cat_batch, cat_valid, self.point_cloud_range,
            self.virtual_voxel_size, caps.voxels, batch_size,
        )
        # the indicator sum and centroid mean RIDE the VFE's cluster-center
        # pass (models/vfe.py _decorate extra_sum): scatter-reduce passes at
        # these row counts are index-latency-bound (~2.7 ms whether 3 or 128
        # channels wide), so folding them saves a whole pass, and dividing
        # by the voxelizer's counts saves the count scatter as well
        voxel_feats, vfe_aux = self.vfe_mod(
            vfe_in, vm, train, extra_sum=indicator[:, None])  # [V, C]
        counts_f = jnp.maximum(vm.unique.counts, 1).astype(jnp.float32)
        vox_indicator = vfe_aux["extra_sum"][:, 0] / counts_f
        virtual_mask = vm.voxel_valid & (vox_indicator > 0)
        # alpha-weighted centroid (single_stage_fsd_v2.py:248-260): gt-fg
        # points weigh 1.0, everything else alpha, so the regression anchor
        # leans toward actual object surface points.
        if train and self.centroid_alpha is not None:
            gfg = gt_fg_points_mask(
                cat_xyz, cat_batch, cat_valid & vm.valid,
                data["gt_boxes"], data["gt_labels"], data["gt_valid"],
            )
            w = jnp.where(gfg, 1.0, self.centroid_alpha)
            w = w * (cat_valid & vm.valid).astype(jnp.float32)
            # one fused 4-ch sum (weighted xyz + weight) instead of two
            swa = segment_reduce(
                jnp.concatenate([cat_xyz * w[:, None], w[:, None]], -1),
                vm.point_seg_ids, caps.voxels, "sum")
            centroid = swa[:, :3] / jnp.maximum(swa[:, 3], 1e-6)[:, None]
        else:
            centroid = vfe_aux["cluster_mean"]

        vgrid = grid_shape_zyx(self.point_cloud_range, self.virtual_voxel_size)
        if data.get("decoder_maps") is not None:
            # --- dense-path multiscale fusion: every active virtual voxel
            # gathers its xy cell from each decoder BEV map (the dense analog
            # of the reference's union-scatter, single_stage_fsd_v2.py:375-436:
            # maps are dense, so every virtual site receives every level).
            maps = data["decoder_maps"]
            feats_sum = voxel_feats
            n_contrib = 1.0
            vc = vm.voxel_coords
            for i, lvl_idx in enumerate(self.multiscale_levels):
                m = maps[lvl_idx]
                b, hl, wl, _ = m.shape
                cy = jnp.clip((vc[:, 2] * hl) // vgrid[1], 0, hl - 1)
                cx = jnp.clip((vc[:, 3] * wl) // vgrid[2], 0, wl - 1)
                cell = (jnp.maximum(vc[:, 0], 0) * hl + cy) * wl + cx
                g = m.reshape(b * hl * wl, -1)[cell]
                feats_sum = feats_sum + self.ms_projs[i](g, vm.voxel_valid, train)
                n_contrib += 1.0
            union_feats = feats_sum / n_contrib
            out_feats = self.mixer_mod(union_feats, vm.voxel_coords,
                                       vm.voxel_valid, batch_size, vgrid[1:],
                                       train)
            # dense path: union slots == virtual-voxel slots, no re-keying
            orig_out = out_feats
        else:
            # --- multiscale fusion onto the virtual grid (:375-436)
            keys_l = [jnp.where(vm.voxel_valid, vm.unique.unique_keys,
                                INT_SENTINEL)]
            feats_l = [voxel_feats]
            valid_l = [vm.voxel_valid]
            ms = data.get("decoder_features")
            plan0 = data.get("unet_plan")
            for i, lvl_idx in enumerate(self.multiscale_levels):
                feats = ms[lvl_idx]
                # decoder feature d (deepest-first, len == num UNet stages S)
                # lives at grid level S-2-d, clamped at 0 (see decoder).
                lvl = max(len(ms) - 2 - lvl_idx, 0)
                sgl = plan0.levels[lvl]
                zs = vgrid[0] // sgl.grid[0]
                ys = vgrid[1] // sgl.grid[1]
                xs = vgrid[2] // sgl.grid[2]
                assert zs >= 1 and ys >= 1 and xs >= 1, (
                    f"ms level {lvl_idx} (grid {sgl.grid}) finer than virtual "
                    f"grid {vgrid}; choose deeper multiscale_levels"
                )
                c = sgl.coords
                proj = jnp.stack(
                    [c[:, 0], c[:, 1] * zs + zs // 2, c[:, 2] * ys + ys // 2,
                     c[:, 3] * xs + xs // 2], axis=-1,
                )
                keys_l.append(linearize_coords(proj, vgrid, sgl.valid))
                feats_l.append(self.ms_projs[i](feats, sgl.valid, train))
                valid_l.append(sgl.valid)

            keys_all = jnp.concatenate(keys_l)
            feats_all = jnp.concatenate(feats_l)
            valid_all = jnp.concatenate(valid_l)
            uu = unique_segments(keys_all, valid_all, caps.union_voxels)
            union_feats = segment_reduce(feats_all, uu.seg_ids,
                                         caps.union_voxels, "mean")
            union_valid = uu.unique_keys != INT_SENTINEL
            union_coords = delinearize_key(uu.unique_keys, vgrid, union_valid)
            union_sg = SparseGrid(
                keys=uu.unique_keys, coords=union_coords, valid=union_valid,
                grid=vgrid, batch_size=batch_size,
            )

            # --- mixer over the fused union grid
            level_caps = [caps.union_voxels]
            for _ in self.mixer_strides:
                level_caps.append(level_caps[-1] // 2)
            plan = build_unet_plan(union_sg, tuple(level_caps),
                                   self.mixer_strides, self.mixer_paddings)
            out_feats = self.mixer_mod(union_feats, plan, train)

            # map original virtual-grid voxels → union slots (first V rows)
            orig_slot = uu.seg_ids[: caps.voxels]
            orig_out = gather_segments(out_feats, orig_slot)

        # --- compact virtual voxels for the head
        vidx, vvalid = topk_compact(vox_indicator, virtual_mask, caps.virtual_out)
        vs = jnp.asarray(self.virtual_voxel_size, jnp.float32)
        pcr = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        vcoords = vm.voxel_coords[vidx]
        vcenters = (vcoords[:, jnp.array([3, 2, 1])].astype(jnp.float32) + 0.5) * vs + pcr

        out = {
            "virtual_feats": orig_out[vidx],
            "virtual_centers": jnp.where(vvalid[:, None], vcenters, 0.0),
            "virtual_batch": jnp.maximum(vcoords[:, 0], 0),
            "virtual_valid": vvalid,
            "virtual_centroid": centroid[vidx],
            "num_virtual": virtual_mask.sum(),
            # capacity observability: union inputs whose voxel fell past the
            # static caps.voxels cap were silently dropped — surface the count
            "num_union_overflow_points": (
                cat_valid & vm.valid
                & (vm.point_seg_ids >= caps.voxels)).sum(),
        }
        if self.as_rpn:
            # recover per-point features (single_stage_fsd_v2.py:131-155)
            pt_feat = gather_segments(orig_out, vm.point_seg_ids)
            pt_vc = (vm.coords[:, jnp.array([3, 2, 1])].astype(jnp.float32) + 0.5) * vs + pcr
            offset = jnp.where(vm.valid[:, None], (pt_vc - cat_xyz) / vs * 2.0, 0.0)
            rec = self.recover_proj(
                jnp.concatenate([pt_feat, offset], axis=-1), vm.valid, train
            )
            out.update(
                pts_feats=rec, pts_xyz=cat_xyz, pts_batch=cat_batch,
                pts_valid=cat_valid & vm.valid, pts_indicator=indicator,
            )
        return out

    # ---------------------------------------------------------------- wiring

    def run_pipeline(self, batch, train: bool, thr_extra: float = 0.0,
                     pretrain: bool = False, detach_seg: bool = True):
        b, p, _ = batch.points.shape
        pts = batch.points.reshape(b * p, -1)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        seg_out = self.segmentor_mod(pts, batch_idx, batch.valid.reshape(-1),
                                     b, train)
        data = {k: seg_out[k] for k in (
            "seg_points", "seg_logits", "seg_vote_preds", "offsets",
            "seg_feats", "batch_idx", "valid", "decoder_features", "unet_plan",
            "decoder_maps",
        ) if k in seg_out}
        if train:
            data.update(gt_boxes=batch.gt_boxes, gt_labels=batch.gt_labels,
                        gt_valid=batch.gt_valid)
            if self.add_gt_fg_points:
                lbl = gt_point_class_labels(
                    seg_out["seg_points"][:, :3], seg_out["batch_idx"],
                    seg_out["valid"], batch.gt_boxes, batch.gt_labels,
                    batch.gt_valid,
                )
                data["gt_point_labels"] = lbl
        if detach_seg:
            for k in ("seg_logits", "seg_vote_preds", "offsets"):
                data[k] = jax.lax.stop_gradient(data[k])
        ex = self.extract_feat(data, b, train, thr_extra, pretrain)
        outs = self.head_mod(ex["virtual_feats"], ex["virtual_valid"], train)
        return {"seg_out": seg_out, "data": data, "ex": ex, "outs": outs,
                "batch_size": b}

    def seg_losses(self, batch, seg_out):
        def tgt_single(points_s, valid_s, boxes_s, labels_s, gv_s):
            return seg_targets(points_s[:, :3], valid_s, boxes_s, labels_s,
                               gv_s, self.num_classes)

        lbl, vt, vmask = jax.vmap(tgt_single)(
            batch.points, batch.valid, batch.gt_boxes, batch.gt_labels,
            batch.gt_valid,
        )
        return self.segmentor_mod.head_mod.losses(
            seg_out["seg_logits"], seg_out["seg_vote_preds"],
            lbl.reshape(-1), vt.reshape(-1, 3), vmask.reshape(-1),
            seg_out["valid"],
        )

    def losses_from_pipeline(self, batch, pipe):
        losses = self.seg_losses(batch, pipe["seg_out"])
        ex = pipe["ex"]
        det = self.head_mod.loss(
            pipe["outs"], ex["virtual_centers"], ex["virtual_batch"],
            ex["virtual_valid"], batch.gt_boxes, batch.gt_labels,
            batch.gt_valid,
        )
        losses.update(det)
        losses["num_virtual"] = ex["num_virtual"].astype(jnp.float32)
        losses["num_union_overflow_points"] = (
            ex["num_union_overflow_points"].astype(jnp.float32))
        return losses

    def loss(self, batch, train: bool = True, thr_extra: float = 0.0,
             pretrain: bool = False):
        pipe = self.run_pipeline(batch, train, thr_extra, pretrain)
        return self.losses_from_pipeline(batch, pipe)

    def predict(self, batch):
        pipe = self.run_pipeline(batch, train=False, detach_seg=False)
        ex = pipe["ex"]
        return self.head_mod.get_bboxes(
            pipe["outs"], ex["virtual_centers"], ex["virtual_batch"],
            ex["virtual_valid"], pipe["batch_size"], **self.test_cfg,
        )

    def __call__(self, batch, train: bool = False):
        return self.run_pipeline(batch, train)["outs"]


class FSDV2(nn.Module):
    """Two-stage FSDv2 (two_stage_fsd_v2.py:11): SingleStageFSDV2 as RPN +
    GroupCorrectionHead over recovered per-point features."""

    single_stage: dict = struct.field(default_factory=dict)
    roi_head: dict = struct.field(default_factory=dict)
    rois_per_sample: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        ss = dict(self.single_stage)
        ss["as_rpn"] = True
        self.rpn = SingleStageFSDV2(dtype=self.dtype, **ss)
        self.roi = GroupCorrectionHead(
            num_classes=self.rpn.num_classes, dtype=self.dtype, **self.roi_head
        )

    def _proposals(self, pipe):
        ex = pipe["ex"]
        outs = pipe["outs"]
        head = self.rpn.head_mod
        b = pipe["batch_size"]
        boxes_l, scores_l, labels_l, valid_l = [], [], [], []
        for t, names in enumerate(head.tasks):
            ids = head._task_class_ids(t)
            scores = jax.nn.sigmoid(outs["cls_logits"][t])
            dec = base_point_decode(ex["virtual_centers"], outs["reg_preds"][t],
                                    head.bbox_coder_scale)
            best = scores.max(axis=-1)
            local = scores.argmax(axis=-1)
            boxes_l.append(dec)
            scores_l.append(best)
            labels_l.append(jnp.asarray(ids, jnp.int32)[local])
            valid_l.append(ex["virtual_valid"])
        boxes = jnp.concatenate(boxes_l)
        scores = jnp.concatenate(scores_l)
        labels = jnp.concatenate(labels_l)
        valid = jnp.concatenate(valid_l)
        batch = jnp.concatenate([ex["virtual_batch"]] * len(head.tasks))

        def per_sample(i):
            m = valid & (batch == i)
            idx, sv = topk_compact(scores, m, self.rois_per_sample)
            return boxes[idx], jnp.where(sv, scores[idx], 0.0), labels[idx], sv

        rb, rs, rl, rv = jax.vmap(per_sample)(jnp.arange(b, dtype=jnp.int32))
        rbt = jnp.repeat(jnp.arange(b, dtype=jnp.int32), self.rois_per_sample)
        return (rb.reshape(b * self.rois_per_sample, -1),
                rs.reshape(-1), rl.reshape(-1), rv.reshape(-1), rbt)

    def _roi_points(self, pipe):
        ex = pipe["ex"]
        return ex["pts_xyz"], ex["pts_feats"], ex["pts_valid"], ex["pts_batch"]

    def loss(self, batch, train: bool = True, thr_extra: float = 0.0,
             pretrain: bool = False):
        pipe = self.rpn.run_pipeline(batch, train, thr_extra, pretrain)
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

    def predict(self, batch, skip_rcnn: bool = False):
        pipe = self.rpn.run_pipeline(batch, train=False, detach_seg=False)
        if skip_rcnn:
            ex = pipe["ex"]
            return self.rpn.head_mod.get_bboxes(
                pipe["outs"], ex["virtual_centers"], ex["virtual_batch"],
                ex["virtual_valid"], pipe["batch_size"], **self.rpn.test_cfg,
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

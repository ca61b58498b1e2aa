"""IncrementalWaymoDataset — sequential multi-frame samples for FSD++.

Rebuild of /root/reference/mmdet3d/datasets/waymo_dataset.py:904
(IncrementalWaymoDataset): item i = the current frame plus the previous
`num_previous_frames` frames of the same sequence, pose-aligned into the
current ego frame, with per-point frame ages and the seed boxes (previous
round's detections, tools/fsdpp/generate_seeds.py) likewise transformed.

Sequence identity follows the waymo-kitti convention image_idx =
seq * 1000 + frame; ego poses come from info["pose"] (4x4 ego→world).
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from sst_tpu.data.datasets import WaymoDataset
from sst_tpu.utils.registry import DATASETS


@DATASETS.register
class IncrementalWaymoDataset(WaymoDataset):
    def __init__(self, *args, seeds_path: str | None = None,
                 num_previous_frames: int = 6, max_points: int = 262144,
                 max_seeds: int = 256, max_gt: int = 128, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_previous_frames = num_previous_frames
        self.max_points = max_points
        self.max_seeds = max_seeds
        self.max_gt = max_gt
        self.seeds = {}
        if seeds_path:
            with open(seeds_path, "rb") as f:
                self.seeds = pickle.load(f)
        # (context, timestamp) lookup for seed keys, built from the converter
        # maps when present; falls back to image_idx keys.
        self._idx2key = {}
        ts_p = os.path.join(self.data_root, "idx2timestamp.pkl")
        cx_p = os.path.join(self.data_root, "idx2contextname.pkl")
        if os.path.exists(ts_p) and os.path.exists(cx_p):
            with open(ts_p, "rb") as f:
                idx2ts = pickle.load(f)
            with open(cx_p, "rb") as f:
                idx2cx = pickle.load(f)
            self._idx2key = {
                k: (idx2cx[k], idx2ts[k]) for k in idx2ts if k in idx2cx
            }

    def _seq_and_frame(self, idx):
        sample_idx = self.infos[idx]["image"]["image_idx"]
        return sample_idx // 1000, sample_idx % 1000

    def _seed_key(self, idx):
        sample_idx = self.infos[idx]["image"]["image_idx"]
        k = f"{sample_idx:07d}"
        return self._idx2key.get(k, k)

    def __getitem__(self, idx):
        cur = self.get_sample(idx)
        cur_seq, _ = self._seq_and_frame(idx)
        cur_pose = np.asarray(self.infos[idx].get("pose", np.eye(4)),
                              np.float64)
        cur_inv = np.linalg.inv(cur_pose)

        pts_list = [cur["points"]]
        frame_list = [np.zeros(len(cur["points"]), np.int32)]
        seed_boxes, seed_labels, seed_scores = [], [], []
        for k in range(1, self.num_previous_frames + 1):
            j = idx - k
            if j < 0 or self._seq_and_frame(j)[0] != cur_seq:
                break
            prev = self.get_sample(j)
            pose = np.asarray(self.infos[j].get("pose", np.eye(4)), np.float64)
            mm = cur_inv @ pose
            p = prev["points"].copy()
            p[:, :3] = (p[:, :3] @ mm[:3, :3].T + mm[:3, 3]).astype(np.float32)
            pts_list.append(p)
            frame_list.append(np.full(len(p), k, np.int32))
            sd = self.seeds.get(self._seed_key(j))
            if sd is not None and len(sd["boxes"]):
                from sst_tpu.ops.incremental import box_frame_transform
                import jax.numpy as jnp

                b = np.asarray(box_frame_transform(
                    jnp.asarray(sd["boxes"][:, :7]), jnp.asarray(pose),
                    jnp.asarray(cur_inv)))
                seed_boxes.append(b)
                seed_labels.append(np.asarray(sd["labels"], np.int32))
                seed_scores.append(np.asarray(sd["scores"], np.float32))

        points = np.concatenate(pts_list)
        frame_inds = np.concatenate(frame_list)
        cap = self.max_points
        if len(points) > cap:
            sel = self._rng.choice(len(points), cap, replace=False)
            points, frame_inds = points[sel], frame_inds[sel]
        n = len(points)
        out_p = np.zeros((cap, points.shape[1]), np.float32)
        out_f = np.zeros(cap, np.int32)
        out_v = np.zeros(cap, bool)
        out_p[:n] = points
        out_f[:n] = frame_inds
        out_v[:n] = True

        sb = np.zeros((self.max_seeds, 7), np.float32)
        sl = np.zeros(self.max_seeds, np.int32)
        ss = np.zeros(self.max_seeds, np.float32)
        sv = np.zeros(self.max_seeds, bool)
        if seed_boxes:
            all_b = np.concatenate(seed_boxes)[: self.max_seeds]
            m = len(all_b)
            sb[:m] = all_b
            sl[:m] = np.concatenate(seed_labels)[:m]
            ss[:m] = np.concatenate(seed_scores)[:m]
            sv[:m] = True

        gb = np.zeros((self.max_gt, 7), np.float32)
        gl = np.zeros(self.max_gt, np.int32)
        gv = np.zeros(self.max_gt, bool)
        if "gt_boxes" in cur and len(cur["gt_boxes"]):
            g = min(len(cur["gt_boxes"]), self.max_gt)
            gb[:g] = cur["gt_boxes"][:g, :7]
            gl[:g] = cur["gt_labels"][:g]
            gv[:g] = True

        return dict(points=out_p, valid=out_v, frame_inds=out_f,
                    gt_boxes=gb, gt_labels=gl, gt_valid=gv,
                    seed_boxes=sb, seed_labels=sl, seed_scores=ss,
                    seed_valid=sv, idx=idx, rng=self._rng)


def box_frame_transform_np(boxes, pre_pose, cur_inv):
    """Host-side 7-dof box pose transform (numpy twin of
    ops/incremental.box_frame_transform)."""
    mm = cur_inv @ pre_pose
    out = boxes.copy()
    out[:, :3] = boxes[:, :3] @ mm[:3, :3].T + mm[:3, 3]
    yaw = boxes[:, 6]
    heading = np.stack([np.sin(yaw), np.cos(yaw), np.zeros_like(yaw)], -1)
    heading = heading @ mm[:3, :3].T
    out[:, 6] = np.arctan2(heading[:, 0], heading[:, 1])
    return out.astype(np.float32)


def run_sequential_eval(dataset, predict_fn, score_thr: float = 0.1,
                        feedback: bool = True):
    """Sequential FSD++ evaluation with seed feedback.

    The TPU counterpart of the reference's reuse test mode
    (two_stage_fsdpp.py:357-403 reuse_simple_test): frames are visited in
    stored (sequence, time) order and frame t's detections — pose-transformed
    into frame t+1's ego frame — replace the offline seeds of frame t+1.
    Sequence boundaries reset the seed state. `predict_fn` maps a collated
    single-sample TemporalBatch to the standard prediction dict.

    Simplification vs the reference: only the immediately previous frame's
    detections seed the next frame (the reference additionally ages seeds up
    to ``max_age``); the dataset still supplies the multi-frame point history.
    """
    live = {}  # seq -> (boxes@prev-ego, labels, scores, prev_pose)
    results = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        seq, _ = dataset._seq_and_frame(idx)
        cur_pose = np.asarray(dataset.infos[idx].get("pose", np.eye(4)),
                              np.float64)
        if feedback:
            sb = np.zeros((dataset.max_seeds, 7), np.float32)
            sl = np.zeros(dataset.max_seeds, np.int32)
            ss = np.zeros(dataset.max_seeds, np.float32)
            sv = np.zeros(dataset.max_seeds, bool)
            if seq in live:
                pb, pl, psc, ppose = live[seq]
                if len(pb):
                    b = box_frame_transform_np(pb, ppose,
                                               np.linalg.inv(cur_pose))
                    m = min(len(b), dataset.max_seeds)
                    sb[:m], sl[:m], ss[:m], sv[:m] = (b[:m], pl[:m], psc[:m],
                                                      True)
            sample = dict(sample, seed_boxes=sb, seed_labels=sl,
                          seed_scores=ss, seed_valid=sv)
        out = predict_fn(collate_temporal([sample]))
        valid = np.asarray(out["valid"][0])
        boxes = np.asarray(out["boxes"][0])[valid][:, :7]
        scores = np.asarray(out["scores"][0])[valid]
        labels = np.asarray(out["labels"][0])[valid]
        results.append(dict(boxes=boxes, scores=scores, labels=labels,
                            idx=sample.get("idx", idx)))
        keep = scores > score_thr
        live[seq] = (boxes[keep], labels[keep], scores[keep], cur_pose)
    return results


def collate_temporal(samples):
    """Stack padded incremental samples into a TemporalBatch."""
    import jax.numpy as jnp

    from sst_tpu.models.fsd import TemporalBatch

    def st(key):
        return jnp.asarray(np.stack([s[key] for s in samples]))

    return TemporalBatch(
        points=st("points"), valid=st("valid"), frame_inds=st("frame_inds"),
        gt_boxes=st("gt_boxes"), gt_labels=st("gt_labels"),
        gt_valid=st("gt_valid"), seed_boxes=st("seed_boxes"),
        seed_labels=st("seed_labels"), seed_scores=st("seed_scores"),
        seed_valid=st("seed_valid"),
    )

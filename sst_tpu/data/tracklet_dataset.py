"""WaymoTrackletDataset — per-tracklet samples for CTRL.

Rebuild of /root/reference/mmdet3d/datasets/waymo_tracklet_dataset.py:28: a
dataset item is one track: per-frame points cropped around the (enlarged)
tracker boxes, pose-aligned into a track-centric frame, plus the per-frame
tracker boxes and the one-to-one gt candidates (tools/ctrl pipeline outputs).

Inputs:
  tracklet_path   pkl of LiDARTracklet (world frame; tools/ctrl/
                  generate_track_input.py --poses)
  candidates_path pkl from tools/ctrl/generate_candidates.py (world frame)
  poses_path      pkl {context_name: {timestamp: 4x4 ego→world}}
  frame_index     pkl {(context_name, timestamp): points .bin path}
                  (built from idx2timestamp/idx2contextname + infos)

Output sample: the fixed-shape dict TrackletBatch collation expects.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from sst_tpu.core.tracklet import pad_tracklet_arrays
from sst_tpu.utils.registry import DATASETS


@DATASETS.register
class WaymoTrackletDataset:
    CLASSES = ("Car", "Pedestrian", "Cyclist")
    TYPE2LABEL = {1: 0, 2: 1, 4: 2}

    def __init__(self, data_root, tracklet_path, poses_path, frame_index_path,
                 candidates_path=None, load_dim: int = 6,
                 use_dim=(0, 1, 2, 3, 4), extra_wlh=(1.0, 1.0, 1.0),
                 max_points: int = 32768, max_frames: int = 200,
                 test_mode: bool = False, seed: int = 0):
        self.data_root = data_root
        with open(tracklet_path, "rb") as f:
            self.tracklets = pickle.load(f)
        with open(poses_path, "rb") as f:
            self.poses = pickle.load(f)
        with open(frame_index_path, "rb") as f:
            self.frame_index = pickle.load(f)
        self.candidates = None
        if candidates_path:
            with open(candidates_path, "rb") as f:
                self.candidates = pickle.load(f)
            assert len(self.candidates) == len(self.tracklets)
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.extra_wlh = np.asarray(extra_wlh, np.float32)
        self.max_points = max_points
        self.max_frames = max_frames
        self.test_mode = test_mode
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.tracklets)

    def _load_frame(self, context, ts):
        path = self.frame_index.get((context, ts))
        if path is None:
            return None
        if not os.path.isabs(path):
            path = os.path.join(self.data_root, path)
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, self.load_dim)
        return pts[:, self.use_dim]

    def __getitem__(self, idx):
        trk = self.tracklets[idx]
        n_frames = min(len(trk), self.max_frames)
        ctr = np.median(trk.boxes[:n_frames, :3], axis=0)

        pts_list, frame_ids = [], []
        world_boxes = trk.boxes[:n_frames].copy()
        for fi in range(n_frames):
            ts = trk.timestamps[fi]
            frame = self._load_frame(trk.context_name, ts)
            if frame is None:
                continue
            pose = np.asarray(self.poses[trk.context_name][ts], np.float64)
            xyz_world = frame[:, :3] @ pose[:3, :3].T + pose[:3, 3]
            box = world_boxes[fi]
            ew = self.extra_wlh
            rel = xyz_world[:, :2] - box[:2]
            c, s = np.cos(-box[6]), np.sin(-box[6])
            lx = rel[:, 0] * c - rel[:, 1] * s
            ly = rel[:, 0] * s + rel[:, 1] * c
            m = (
                (np.abs(lx) <= box[3] / 2 + ew[0])
                & (np.abs(ly) <= box[4] / 2 + ew[1])
                & (xyz_world[:, 2] >= box[2] - ew[2])
                & (xyz_world[:, 2] <= box[2] + box[5] + ew[2])
            )
            crop = np.concatenate(
                [xyz_world[m] - ctr, frame[m, 3:],
                 np.full((int(m.sum()), 1), fi * 0.1, np.float32)], axis=1,
            ).astype(np.float32)
            pts_list.append(crop)
            frame_ids.append(np.full(len(crop), fi, np.int32))

        points = np.concatenate(pts_list) if pts_list else \
            np.zeros((0, len(self.use_dim) + 1), np.float32)
        frame_inds = np.concatenate(frame_ids) if frame_ids else \
            np.zeros(0, np.int32)
        boxes = world_boxes.copy()
        boxes[:, :3] -= ctr

        gt_boxes = gt_valid = None
        if self.candidates is not None:
            cand = self.candidates[idx]
            gt_boxes = cand["boxes"][:n_frames].copy()
            gt_boxes[:, :3] -= ctr
            gt_valid = cand["valid"][:n_frames]

        out = pad_tracklet_arrays(
            points, frame_inds, boxes, trk.scores[:n_frames], gt_boxes,
            gt_valid, self.TYPE2LABEL.get(trk.type_id, 0), self.max_points,
            self.max_frames,
        )
        out["idx"] = idx
        out["track_center"] = ctr
        out["rng"] = self._rng
        return out


    # ------------------------------------------------------------ evaluation

    def format_results(self, results, out_path: str):
        """Refined per-tracklet boxes → WOD Objects bin with track ids
        (reference waymo_tracklet_dataset.py:394-451 format_results).

        results[i] aligns with tracklet i: dict with 'boxes' [F,7] in the
        track-centric frame (see __getitem__), 'scores' [F], 'valid' [F],
        optional 'track_center' [3] (defaults to the same median used when
        the sample was built)."""
        from sst_tpu.core.tracklet import LiDARTracklet, tracklets_to_bin

        refined = []
        for i, r in enumerate(results):
            trk = self.tracklets[i]
            n = min(len(trk), self.max_frames)
            boxes = np.asarray(r["boxes"], np.float32)[:n].copy()
            scores = np.asarray(r["scores"], np.float32)[:n]
            valid = np.asarray(r.get("valid", np.ones(n, bool)))[:n]
            ctr = np.asarray(
                r.get("track_center", np.median(trk.boxes[:n, :3], axis=0)),
                np.float32,
            )
            boxes[:, :3] += ctr  # back to world
            keep = np.flatnonzero(valid)
            if len(keep) == 0:
                continue
            world = type(trk)(
                context_name=trk.context_name, obj_id=trk.obj_id,
                type_id=trk.type_id,
                timestamps=[trk.timestamps[j] for j in keep],
                boxes=boxes[keep], scores=scores[keep],
            )
            poses = self.poses[trk.context_name]
            refined.append(world.to_ego(poses))
        tracklets_to_bin(refined, out_path)
        return refined

    def evaluate(self, results, out_path: str, gt_bin: str | None = None,
                 metric: str = "waymo"):
        """Write the refined-tracklet bin and, when a gt bin is given, score
        it (official compute_detection_metrics_main when on PATH, else the
        in-repo mAP/mAPH protocol) — reference
        waymo_tracklet_dataset.py:298-392 evaluate."""
        self.format_results(results, out_path)
        if gt_bin is None:
            return {"bin_path": out_path}
        from sst_tpu.core.eval_waymo import waymo_eval
        from sst_tpu.core.waymo_bin import read_bin_as_frames

        import shutil
        import subprocess

        binary = shutil.which("compute_detection_metrics_main")
        if binary and metric == "waymo":
            proc = subprocess.run([binary, out_path, gt_bin],
                                  capture_output=True, text=True)
            return {"bin_path": out_path, "official": proc.stdout}
        preds_by_key = read_bin_as_frames(out_path)
        gts_by_key = read_bin_as_frames(gt_bin)
        keys = sorted(gts_by_key)
        preds = [preds_by_key.get(
            k, dict(boxes=np.zeros((0, 7)), scores=np.zeros(0),
                    labels=np.zeros(0, np.int32))) for k in keys]
        gts = [gts_by_key[k] for k in keys]
        res = waymo_eval(preds, gts, classes=list(self.CLASSES))
        res["bin_path"] = out_path
        return res


def collate_tracklets(samples):
    """Stack padded tracklet samples into a TrackletBatch."""
    import jax.numpy as jnp

    from sst_tpu.models.ctrl import TrackletBatch

    def st(key):
        return jnp.asarray(np.stack([s[key] for s in samples]))

    return TrackletBatch(
        points=st("points"), valid=st("valid"), frame_inds=st("frame_inds"),
        trk_boxes=st("trk_boxes"), trk_scores=st("trk_scores"),
        trk_valid=st("trk_valid"),
        labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
        gt_boxes=st("gt_boxes"), gt_valid=st("gt_valid"),
    )

"""End-to-end CTRL data path: synthetic frames → track-input tool →
candidates tool → WaymoTrackletDataset → TrackletBatch → TrackletDetector."""

import os
import pickle

import numpy as np
import pytest

from sst_tpu.core.tracklet import LiDARTracklet, tracklets_to_bin


@pytest.fixture
def ctrl_world(tmp_path):
    rng = np.random.RandomState(0)
    ctx = "ctx0"
    n_frames = 6
    timestamps = [1000 + 100 * i for i in range(n_frames)]
    poses = {ctx: {ts: np.eye(4) for ts in timestamps}}
    # one moving car track in world coords
    centers = np.stack(
        [np.linspace(5, 8, n_frames), np.linspace(2, 2.5, n_frames),
         np.full(n_frames, -1.0)], 1,
    )
    boxes = np.concatenate(
        [centers, np.tile([[2.0, 4.5, 1.6]], (n_frames, 1)),
         np.zeros((n_frames, 1))], 1,
    ).astype(np.float32)
    trk = LiDARTracklet(ctx, "car-1", 1, timestamps, boxes,
                        np.full(n_frames, 0.9, np.float32))
    # frame point clouds: points on the object + background
    frame_index = {}
    for i, ts in enumerate(timestamps):
        obj = centers[i] + rng.randn(300, 3) * np.asarray([1.0, 0.5, 0.4])
        obj[:, 2] = np.clip(obj[:, 2], -1.0, 0.6)
        bg = rng.uniform(-40, 40, (700, 3))
        pts = np.concatenate([obj, bg]).astype(np.float32)
        feats = rng.rand(1000, 3).astype(np.float32)
        arr = np.concatenate([pts, feats], 1)
        rel = f"frame_{i}.bin"
        arr.tofile(tmp_path / rel)
        frame_index[(ctx, ts)] = rel
    with open(tmp_path / "poses.pkl", "wb") as f:
        pickle.dump(poses, f)
    with open(tmp_path / "frame_index.pkl", "wb") as f:
        pickle.dump(frame_index, f)
    with open(tmp_path / "tracklets.pkl", "wb") as f:
        pickle.dump([trk], f)
    # candidates = boxes + noise
    cands = [dict(boxes=boxes + 0.05, valid=np.ones(n_frames, bool))]
    with open(tmp_path / "cands.pkl", "wb") as f:
        pickle.dump(cands, f)
    return tmp_path


def test_tracklet_dataset_and_model(ctrl_world):
    import jax

    from sst_tpu.data.tracklet_dataset import (
        WaymoTrackletDataset,
        collate_tracklets,
    )
    from tests.test_ctrl import tiny_tracklet_detector

    ds = WaymoTrackletDataset(
        data_root=str(ctrl_world),
        tracklet_path=str(ctrl_world / "tracklets.pkl"),
        poses_path=str(ctrl_world / "poses.pkl"),
        frame_index_path=str(ctrl_world / "frame_index.pkl"),
        candidates_path=str(ctrl_world / "cands.pkl"),
        load_dim=6, use_dim=(0, 1, 2, 3, 4),
        max_points=2048, max_frames=8,
    )
    assert len(ds) == 1
    s = ds[0]
    assert s["points"].shape == (2048, 6)  # 5 used dims + time channel
    assert s["valid"].sum() > 100  # object points cropped in
    assert s["trk_valid"].sum() == 6
    assert s["gt_valid"].sum() == 6
    # track-centric frame: boxes near origin
    assert np.abs(s["trk_boxes"][s["trk_valid"], :2]).max() < 3.0

    batch = collate_tracklets([s, s])
    model = tiny_tracklet_detector()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        batch, train=True, method=model.loss, mutable=["batch_stats"],
    )
    total = sum(float(v) for k, v in out.items() if k.startswith("loss"))
    assert np.isfinite(total), out

"""Tests for GT-database sampling (ObjectSample), multi-sweep loading,
point-drop transforms, ObjectNoise, and the CBGS wrapper."""

import os
import pickle

import numpy as np
import pytest

from sst_tpu.data.dbsampler import DataBaseSampler, ObjectSample, _points_in_bev_boxes
from sst_tpu.data.pipelines import (
    FrameDropout,
    LoadPointsFromMultiSweeps,
    ObjectNoise,
    RandomPointDrop,
)


@pytest.fixture
def db(tmp_path):
    rng = np.random.RandomState(0)
    infos = {"Car": [], "Pedestrian": []}
    os.makedirs(tmp_path / "db", exist_ok=True)
    for i in range(20):
        name = "Car" if i % 2 == 0 else "Pedestrian"
        pts = rng.randn(50, 5).astype(np.float32) * 0.5
        rel = f"db/obj_{i}.bin"
        pts.tofile(tmp_path / rel)
        box = np.array(
            [rng.uniform(-20, 20), rng.uniform(-20, 20), -0.5,
             2.0, 4.5, 1.6, rng.uniform(-3, 3)], np.float32,
        )
        infos[name].append(
            dict(path=rel, box3d_lidar=box, name=name,
                 num_points_in_gt=50, difficulty=0)
        )
    info_path = tmp_path / "dbinfos.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return str(info_path), str(tmp_path)


def test_db_sampler_basic(db):
    info_path, root = db
    sampler = DataBaseSampler(
        info_path, root,
        prepare=dict(filter_by_min_points=dict(Car=10, Pedestrian=10)),
        sample_groups=dict(Car=5, Pedestrian=3),
        classes=("Car", "Pedestrian", "Cyclist"),
        points_loader=dict(load_dim=5, use_dim=[0, 1, 2, 3, 4]),
    )
    gt = np.array([[0, 0, -0.5, 2, 4.5, 1.6, 0.0]], np.float32)
    out = sampler.sample_all(gt, ["Car"])
    assert out is not None
    assert out["gt_boxes"].shape[1] == 7
    assert len(out["gt_names"]) == len(out["gt_boxes"])
    assert (out["gt_labels"] >= 0).all()
    # no pasted box may collide with the original gt
    from sst_tpu.core.evaluation import rotated_iou_matrix
    iou = rotated_iou_matrix(out["gt_boxes"], gt, mode="bev")
    assert (iou < 1e-3).all()
    # pasted boxes must not collide with each other
    if len(out["gt_boxes"]) > 1:
        self_iou = rotated_iou_matrix(out["gt_boxes"], out["gt_boxes"], "bev")
        np.fill_diagonal(self_iou, 0)
        assert (self_iou < 1e-3).all()


def test_object_sample_transform(db):
    info_path, root = db
    rng = np.random.RandomState(1)
    tr = ObjectSample(dict(
        info_path=info_path, data_root=root,
        sample_groups=dict(Car=8, Pedestrian=8),
        classes=("Car", "Pedestrian", "Cyclist"),
        points_loader=dict(load_dim=5, use_dim=[0, 1, 2, 3, 4]),
    ))
    sample = dict(
        points=rng.uniform(-30, 30, (2000, 5)).astype(np.float32),
        gt_boxes=np.array([[0, 0, -0.5, 2, 4.5, 1.6, 0.3]], np.float32),
        gt_labels=np.array([0], np.int32),
        gt_names=["Car"],
        rng=rng,
    )
    n_before = len(sample["points"])
    out = tr(sample)
    assert len(out["gt_boxes"]) > 1
    assert len(out["gt_labels"]) == len(out["gt_boxes"]) == len(out["gt_names"])
    # original points inside pasted boxes were removed
    pasted = out["gt_boxes"][1:]
    orig_part = out["points"][-(n_before - 10):]  # tail is original points


def test_points_in_bev_boxes():
    boxes = np.array([[0, 0, 0, 2, 4, 2, np.pi / 2]], np.float32)
    pts = np.array([[1.5, 0.5, 0.0], [0.5, 1.5, 0.0]], np.float32)
    m = _points_in_bev_boxes(pts, boxes)
    # yaw 90deg swaps extents: x extent becomes 4/2, y becomes 2/2
    assert m[0] and not m[1]


def test_multisweep_and_framedrop(tmp_path):
    rng = np.random.RandomState(0)
    sw_pts = rng.randn(100, 5).astype(np.float32) * 10
    sw_path = tmp_path / "sweep.bin"
    sw_pts.tofile(sw_path)
    pose_cur = np.eye(4)
    pose_prev = np.eye(4)
    pose_prev[:3, 3] = [1.0, 0, 0]
    sample = dict(
        points=rng.randn(200, 5).astype(np.float32) * 10,
        timestamp=10.0,
        pose=pose_cur,
        sweeps=[dict(data_path=str(sw_path), timestamp=9.9, pose=pose_prev)],
        rng=rng,
    )
    tr = LoadPointsFromMultiSweeps(sweeps_num=1, load_dim=5,
                                   use_dim=(0, 1, 2, 3, 4))
    out = tr(sample)
    assert out["points"].shape[1] == 6  # time-lag channel appended
    lags = np.unique(out["points"][:, -1])
    assert 0.0 in lags and any(abs(l - 0.1) < 1e-6 for l in lags)

    fd = FrameDropout(drop_ratio=1.0)  # always drop past frames
    out2 = fd(dict(points=out["points"].copy(), rng=rng))
    assert (out2["points"][:, -1] == 0).all()


def test_random_point_drop():
    rng = np.random.RandomState(3)
    s = dict(points=np.zeros((1000, 4), np.float32), rng=rng)
    out = RandomPointDrop(max_ratio=0.5, prob=1.0)(s)
    assert 400 <= len(out["points"]) <= 1000


def test_object_noise_moves_points():
    rng = np.random.RandomState(5)
    box = np.array([[5, 5, -1, 2, 4, 2, 0.0]], np.float32)
    inside = np.array([[5.1, 5.2, 0.0, 1.0]], np.float32)
    outside = np.array([[20, 20, 0, 1.0]], np.float32)
    s = dict(points=np.concatenate([inside, outside]),
             gt_boxes=box.copy(), gt_labels=np.array([0]), rng=rng)
    out = ObjectNoise(translation_std=(1.0, 1.0, 0.0),
                      rot_range=(-0.5, 0.5))(s)
    moved = out["gt_boxes"][0]
    assert not np.allclose(moved, box[0])
    # interior point moved with the box; exterior untouched
    assert not np.allclose(out["points"][0, :2], inside[0, :2])
    assert np.allclose(out["points"][1], outside[0])


def test_cbgs_wrapper():
    from sst_tpu.data.datasets import CBGSDataset

    class FakeDS:
        classes = ["a", "b"]

        def __init__(self):
            # class 'a' common, 'b' rare
            self.infos = [dict(gt_names=["a"])] * 9 + [dict(gt_names=["b"])]

        def __len__(self):
            return len(self.infos)

        def __getitem__(self, i):
            return i

    ds = CBGSDataset(FakeDS())
    idx = list(ds.sample_indices)
    frac_b = sum(1 for i in idx if i == 9) / len(idx)
    assert frac_b > 0.25  # rare class oversampled toward 1/2

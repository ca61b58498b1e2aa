"""Waymo tfrecord converter: proto encode→decode round trip, range-image →
point-cloud geometry against independently inverted projections, KITTI
output consumed by WaymoDataset end to end."""

import os
import pickle

import numpy as np
import pytest

from sst_tpu.data import waymo_proto as wp

H, W = 4, 16
INCLINATIONS = np.array([-0.3, -0.1, 0.1, 0.3])  # min→max (proto order)


def _project(p):
    """Invert the range-image projection for identity extrinsic: point →
    (row, col_center_azimuth, range). Row 0 is the TOP beam."""
    r = np.linalg.norm(p)
    incl = np.arcsin(p[2] / r)
    az = np.arctan2(p[1], p[0])
    # row: inclinations reversed (row 0 = max)
    row = np.argmin(np.abs(INCLINATIONS[::-1] - incl))
    # azimuth[col] = ((W - col - 0.5)/W * 2 - 1) * pi
    col = W - 0.5 - (az / np.pi + 1) * W / 2
    return int(row), int(round(col)), r


def _col_azimuth(col):
    return ((W - col - 0.5) / W * 2 - 1) * np.pi


def _make_range_image(points):
    """Place points exactly on the beam/azimuth grid; returns ([H, W, 4]
    image, exact grid points)."""
    img = np.zeros((H, W, 4), np.float32)
    exact = []
    used = set()
    for p in points:
        row, col, r = _project(p)
        if (row, col) in used:  # one return per pixel
            continue
        used.add((row, col))
        incl = INCLINATIONS[::-1][row]
        az = _col_azimuth(col)
        q = np.array([np.cos(incl) * np.cos(az), np.cos(incl) * np.sin(az),
                      np.sin(incl)]) * r
        img[row, col, 0] = r
        img[row, col, 1] = 0.5  # intensity
        img[row, col, 2] = 0.25  # elongation
        exact.append(q)
    return img, np.asarray(exact)


@pytest.fixture
def mini_world(tmp_path):
    """One tfrecord, two frames, TOP lidar with identity extrinsic +
    per-pixel poses, one vehicle + one pedestrian label."""
    rng = np.random.RandomState(0)
    raw_pts = rng.uniform(-10, 10, (12, 3))
    raw_pts[:, 2] = rng.uniform(-1.5, 1.5, 12)
    img, exact = _make_range_image(raw_pts)

    # identity per-pixel pose grid (roll/pitch/yaw/t = 0 means world==vehicle
    # only if frame pose is identity too)
    pose_ri = np.zeros((H, W, 6), np.float32)

    records = []
    for frame_i in range(2):
        cal = wp.enc_bytes(3, wp.enc_laser_calibration(
            1, np.eye(4), beam_inclinations=INCLINATIONS))
        laser = wp.enc_varint(1, 1) + wp.enc_bytes(
            2, wp.enc_range_image(img, pose=pose_ri))
        veh = wp.enc_label(
            [4.0, 2.0, 1.0, 4.5, 1.9, 1.6, 0.3], type_id=1, obj_id="veh-1",
            num_points=25, difficulty=0, speed=(3.0, -1.0))
        ped = wp.enc_label(
            [-3.0, 5.0, 0.2, 0.9, 0.8, 1.7, -1.1], type_id=2,
            obj_id="ped-7", num_points=4, difficulty=2)
        empty = wp.enc_label(  # 0-point labels must be dropped
            [20.0, 20.0, 0.0, 4.0, 2.0, 1.5, 0.0], type_id=1,
            obj_id="ghost", num_points=0)
        records.append(wp.enc_frame(
            "ctx-test", 1000000 + frame_i * 100000,
            np.eye(4), cal, [laser], [veh, ped, empty]))
    path = tmp_path / "seg-0.tfrecord"
    wp.write_tfrecord(str(path), records)
    return tmp_path, exact


def test_proto_roundtrip(mini_world):
    tmp_path, _ = mini_world
    recs = list(wp.read_tfrecord(str(tmp_path / "seg-0.tfrecord")))
    assert len(recs) == 2
    frame = wp.parse_frame(recs[0])
    assert frame["context_name"] == "ctx-test"
    assert frame["timestamp_micros"] == 1000000
    assert 1 in frame["laser_calibrations"]
    np.testing.assert_allclose(
        frame["laser_calibrations"][1]["beam_inclinations"], INCLINATIONS)
    assert frame["lasers"][1][0]["range_image"].shape == (H, W, 4)
    assert frame["lasers"][1][0]["pose"].shape == (H, W, 6)
    labs = frame["laser_labels"]
    assert [l["id"] for l in labs] == ["veh-1", "ped-7", "ghost"]
    np.testing.assert_allclose(labs[0]["box"],
                               [4.0, 2.0, 1.0, 4.5, 1.9, 1.6, 0.3])
    np.testing.assert_allclose(labs[0]["speed"], [3.0, -1.0])
    assert labs[1]["detection_difficulty_level"] == 2


def test_range_image_geometry(mini_world):
    from tools.data_converter.waymo_converter import range_image_to_points

    tmp_path, exact = mini_world
    frame = wp.parse_frame(next(
        wp.read_tfrecord(str(tmp_path / "seg-0.tfrecord"))))
    img = frame["lasers"][1][0]["range_image"]
    pts, mask = range_image_to_points(img, np.eye(4), INCLINATIONS)
    assert len(pts) == len(exact)
    # order differs (row-major scan); match by nearest neighbor
    d = np.linalg.norm(pts[:, None] - exact[None], axis=-1)
    assert d.min(axis=1).max() < 1e-4

    # per-pixel poses: a pure translation shifts every point
    pose = np.zeros((H, W, 6))
    pose[..., 3] = 2.0  # tx
    pts_t, _ = range_image_to_points(img, np.eye(4), INCLINATIONS,
                                     pixel_pose=pose, frame_pose=np.eye(4))
    d2 = np.linalg.norm((pts_t - 2.0 * np.eye(3)[0])[:, None] - exact[None],
                        axis=-1)
    assert d2.min(axis=1).max() < 1e-4


def test_convert_end_to_end(mini_world, tmp_path):
    from tools.data_converter.waymo_converter import Waymo2KITTI

    load_dir, exact = mini_world
    save_dir = tmp_path / "kitti_format"
    conv = Waymo2KITTI(str(load_dir), str(save_dir), prefix=0,
                       split="train")
    infos = conv.convert()
    assert len(infos) == 2

    # velodyne bin: 6-dim, both labels' points present
    pc = np.fromfile(save_dir / "velodyne/0000000.bin",
                     np.float32).reshape(-1, 6)
    assert len(pc) == len(exact)
    assert (pc[:, 5] == 1000000).all()
    np.testing.assert_allclose(sorted(pc[:, 1].tolist()),
                               sorted(exact[:, 1].tolist()), atol=1e-4)

    # labels: ghost (0 points) dropped, Sign never emitted
    annos = infos[0]["annos"]
    assert list(annos["name"]) == ["Car", "Pedestrian"]
    assert annos["num_points_in_gt"].tolist() == [25, 4]
    assert annos["difficulty"].tolist() == [0, 2]
    np.testing.assert_allclose(annos["speed"][0], [3.0, -1.0])

    # maps + gt bin
    with open(save_dir / "idx2timestamp.pkl", "rb") as f:
        ts = pickle.load(f)
    assert ts["0000000"] == 1000000
    from sst_tpu.core.waymo_bin import read_waymo_bin

    gt = read_waymo_bin(str(save_dir / "gt.bin"))
    assert len(gt) == 4  # 2 frames x (veh + ped)
    assert all(o["context_name"] == "ctx-test" for o in gt)
    veh = next(o for o in gt if o["id"] == "veh-1")
    # the bin stores native waymo boxes: center z and raw heading round-trip
    np.testing.assert_allclose(
        [veh["box"]["center_x"], veh["box"]["center_y"],
         veh["box"]["center_z"], veh["box"]["heading"]],
        [4.0, 2.0, 1.0, 0.3], atol=1e-3)

    # WaymoDataset consumes the infos end to end, and evaluating the gt
    # against itself is a perfect score
    from sst_tpu.data.datasets import WaymoDataset

    ds = WaymoDataset(data_root=str(save_dir),
                      info_path=str(save_dir / "waymo_infos_train.pkl"))
    s = ds[0]
    assert s["points"].shape[1] == 5  # use_dim drops the timestamp
    assert len(s["gt_boxes"]) == 2
    # lidar-frame vehicle gt must match the original waymo label
    veh = s["gt_boxes"][list(s["gt_names"]).index("Car")]
    np.testing.assert_allclose(veh[:3], [4.0, 2.0, 0.2], atol=1e-3)
    np.testing.assert_allclose(veh[3:6], [1.9, 4.5, 1.6], atol=1e-3)

    results = [dict(boxes_3d=ds[i]["gt_boxes"],
                    scores_3d=np.ones(len(ds[i]["gt_boxes"])),
                    labels_3d=ds[i]["gt_labels"]) for i in range(2)]
    out = ds.evaluate(results, metric="fast")
    assert out["Vehicle/L2 mAP"] == 100.0
    assert out["Vehicle/L2 mAPH"] == 100.0

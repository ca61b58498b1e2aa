"""Golden tests for the self-contained AV2 HD-map reader (core/av2_map.py)
and the ROI-filtered CDS protocol (core/eval_argo2.prune_frames_to_roi),
replacing the av2-devkit calls in the reference's tools/argo/create_roi_mask.py
and argo2_dataset.py:509-519 (DetectionCfg eval_only_roi_instances=True).

The fixture is a synthetic per-log map directory in av2's on-disk format:
one rectangular drivable area, a flat ground-height raster, and an ego-pose
feather — small enough that every expected mask value is hand-computable.
"""

import json
import os
import subprocess
import sys
import pickle

import numpy as np
import pytest

from sst_tpu.core.av2_map import (
    ArgoverseStaticMap, SE3, Sim2, box_corners_3d,
    compute_objects_in_roi_mask, load_mapped_avm_and_egoposes, quat_to_mat,
    read_city_SE3_ego)
from sst_tpu.core.eval_argo2 import argo2_eval, prune_frames_to_roi

LOG_ID = "11111111-2222-3333-4444-555555555555"
TS = 315969904359876000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixture_log(root, yaw_deg=0.0, t_xyz=(0.0, 0.0, 0.0)):
    """Synthetic av2 sensor log: drivable rectangle x:[100,120] y:[200,210]
    (city frame), ground plane z=1.5 over x:[90,130] y:[190,220]."""
    log_dir = os.path.join(root, LOG_ID)
    map_dir = os.path.join(log_dir, "map")
    os.makedirs(map_dir, exist_ok=True)

    rect = [(100.0, 200.0), (120.0, 200.0), (120.0, 210.0), (100.0, 210.0)]
    vector_map = {"drivable_areas": {"7001": {
        "id": 7001,
        "area_boundary": [{"x": x, "y": y, "z": 1.5} for x, y in rect],
    }}, "lane_segments": {}, "pedestrian_crossings": {}}
    with open(os.path.join(
            map_dir, f"log_map_archive_{LOG_ID}__SyntheticCity.json"),
            "w") as f:
        json.dump(vector_map, f)

    # ground raster: 0.3 m resolution (s = 1/0.3), origin at (90, 190)
    s = 1.0 / 0.3
    gh = np.full((100, 134), 1.5, np.float16)  # covers 40.2 x 30 m
    gh[:3, :] = np.nan  # an undefined strip at low y
    np.save(os.path.join(
        map_dir, f"{LOG_ID}_ground_height_surface__SyntheticCity.npy"), gh)
    with open(os.path.join(map_dir, f"{LOG_ID}___img_Sim2_city.json"),
              "w") as f:
        json.dump({"R": [1.0, 0.0, 0.0, 1.0], "t": [-90.0, -190.0],
                   "s": s}, f)

    import pandas as pd
    yaw = np.deg2rad(yaw_deg)
    df = pd.DataFrame({
        "timestamp_ns": [TS],
        "qw": [np.cos(yaw / 2)], "qx": [0.0], "qy": [0.0],
        "qz": [np.sin(yaw / 2)],
        "tx_m": [t_xyz[0]], "ty_m": [t_xyz[1]], "tz_m": [t_xyz[2]],
    })
    df.to_feather(os.path.join(log_dir, "city_SE3_egovehicle.feather"))
    return log_dir


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("av2_sensor_val")
    _write_fixture_log(str(root), yaw_deg=0.0, t_xyz=(110.0, 205.0, 0.0))
    return str(root)


def test_drivable_and_roi_rasters(fixture_root):
    avm = ArgoverseStaticMap.from_map_dir(
        os.path.join(fixture_root, LOG_ID, "map"))
    pts = np.array([
        [110.0, 205.0, 1.5],   # rectangle center: drivable, roi
        [100.5, 200.5, 1.5],   # just inside corner: drivable, roi
        [124.0, 205.0, 1.5],   # 4 m beyond +x edge: not drivable, in roi
        [126.0, 205.0, 1.5],   # 6 m beyond: not drivable, outside roi
        [110.0, 214.5, 1.5],   # 4.5 m beyond +y edge: roi only
        [110.0, 216.0, 1.5],   # 6 m beyond: outside roi
    ])
    drv = avm.get_raster_layer_points_boolean(pts, "drivable_area")
    roi = avm.get_raster_layer_points_boolean(pts, "roi")
    assert drv.tolist() == [True, True, False, False, False, False]
    assert roi.tolist() == [True, True, True, False, True, False]


def test_ground_points_boolean(fixture_root):
    avm = ArgoverseStaticMap.from_map_dir(
        os.path.join(fixture_root, LOG_ID, "map"))
    pts = np.array([
        [110.0, 205.0, 1.5],    # on the plane -> ground
        [110.0, 205.0, 1.79],   # within 0.3 m -> ground
        [110.0, 205.0, 2.5],    # 1 m above -> not ground
        [110.0, 190.2, 1.5],    # NaN strip (y in [190, 190.9)) -> False
        [500.0, 500.0, 1.5],    # outside raster -> fill NaN -> False
    ])
    g = avm.get_ground_points_boolean(pts)
    assert g.tolist() == [True, True, False, False, False]


def test_ego_pose_reader_and_transform(fixture_root):
    poses = read_city_SE3_ego(os.path.join(fixture_root, LOG_ID))
    se3 = poses[TS]
    np.testing.assert_allclose(
        se3.transform_point_cloud(np.array([[0.0, 0.0, 0.0]])),
        [[110.0, 205.0, 0.0]], atol=1e-9)
    # quat_to_mat: 90-degree z rotation maps +x to +y
    R = quat_to_mat(np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4))
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_box_corners_and_roi_cuboid_mask(fixture_root):
    avm = ArgoverseStaticMap.from_map_dir(
        os.path.join(fixture_root, LOG_ID, "map"))
    # axis-aligned 4x2x2 box at the rectangle center: fully inside
    # one at x=126.5: nearest vertex at 124.5 -> 4.5 m out, still in ROI
    # one at x=140: nearest vertex 18 m out -> outside
    boxes_city = np.array([
        [110.0, 205.0, 2.0, 4.0, 2.0, 2.0, 0.0],
        [126.5, 205.0, 2.0, 4.0, 2.0, 2.0, 0.0],
        [140.0, 205.0, 2.0, 4.0, 2.0, 2.0, 0.0],
    ])
    keep = compute_objects_in_roi_mask(boxes_city, avm)
    assert keep.tolist() == [True, True, False]
    corners = box_corners_3d(boxes_city[:1])
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners[0, :, 0].max(), 112.0)
    np.testing.assert_allclose(corners[0, :, 2].min(), 1.0)


def test_sim2_round_trip_and_raster_indexing():
    # values_at truncates (int64 cast) and indexes [y, x]
    arr = np.arange(12).reshape(3, 4)
    from sst_tpu.core.av2_map import RasterLayer
    lay = RasterLayer(arr, Sim2(np.eye(2), [0.0, 0.0], 1.0))
    # note: -0.1 TRUNCATES to 0 and reads in-bounds — the devkit's own
    # astype(int64) behavior (av2 RasterMapLayer.get_raster_values_at_coords)
    vals = lay.values_at(np.array([[2.9, 1.1], [3.99, 2.99], [-0.1, 0.0],
                                   [-1.1, 0.0], [4.0, 0.0]]), -1)
    assert vals.tolist() == [arr[1, 2], arr[2, 3], arr[0, 0], -1, -1]


def test_create_roi_mask_tool(fixture_root, tmp_path):
    """End-to-end: the CLI port writes the same mask/{sample_idx}.bin
    payload the reference tool does (reference create_roi_mask.py:28-31)."""
    argo2_root = tmp_path / "argo2"
    split_dir = argo2_root / "argo2_format" / "sensor" / "val"
    os.makedirs(split_dir, exist_ok=True)
    os.symlink(os.path.join(fixture_root, LOG_ID), split_dir / LOG_ID)

    velo = argo2_root / "kitti_format" / "training" / "velodyne"
    os.makedirs(velo, exist_ok=True)
    # ego at (110, 205, 0): ego-frame points -> city = ego + (110, 205, 0)
    pts = np.array([
        [0.0, 0.0, 1.5, 0.1],     # city (110,205): roi+ground+drivable
        [16.0, 0.0, 1.5, 0.1],    # city (126,205): on ground plane only
        [4.0, 0.0, 5.0, 0.1],     # city (114,205,5): roi+drivable, not gnd
    ], np.float32)
    pts.tofile(velo / "000000.bin")

    infos = [{"uuid": f"{LOG_ID}/{TS}", "sample_idx": "000000",
              "point_cloud": {"velodyne_path":
                              "training/velodyne/000000.bin"}}]
    infos_path = argo2_root / "infos_val.pkl"
    with open(infos_path, "wb") as f:
        pickle.dump(infos, f)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/argo/create_roi_mask.py"),
         "--argo2-root", str(argo2_root), "--infos", str(infos_path),
         "--split", "val", "--num-process", "1"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    mask = np.fromfile(
        argo2_root / "kitti_format" / "training" / "mask" / "000000.bin",
        dtype=bool).reshape(-1, 3)
    expect = np.array([[True, True, True],
                       [False, True, False],
                       [True, False, True]])
    np.testing.assert_array_equal(mask, expect)


def test_roi_filtered_cds_matches_manual_filter(fixture_root):
    """prune_frames_to_roi + argo2_eval == argo2_eval on the hand-filtered
    subset: the ROI-filtered CDS protocol on the synthetic fixture."""
    classes = ["REGULAR_VEHICLE"]
    rng = np.random.RandomState(0)

    # ego-frame bottom-center boxes; ego at city (110, 205, 0), yaw 0
    def box(x_ego, score):
        return [x_ego, 0.0, 0.0, 4.0, 2.0, 1.8, 0.0], score

    gt_in = [0.0, 5.0]          # city x 110, 115: in roi
    gt_out = [40.0]             # city x 150: far outside roi
    pred_in = [0.2, 5.1]        # match the two kept gts
    pred_out = [40.1]           # would match the pruned gt

    gts = [{"boxes": np.array([box(x, 1)[0] for x in gt_in + gt_out]),
            "labels": np.zeros(3, np.int64)}]
    preds = [{"boxes": np.array([box(x, 1)[0] for x in pred_in + pred_out]),
              "scores": np.array([0.9, 0.8, 0.7]),
              "labels": np.zeros(3, np.int64)}]
    infos = [{"uuid": f"{LOG_ID}/{TS}"}]

    p2, g2 = prune_frames_to_roi(preds, gts, infos, fixture_root)
    assert len(g2[0]["boxes"]) == 2 and len(p2[0]["boxes"]) == 2
    got = argo2_eval(p2, g2, classes)

    manual_p = [{"boxes": preds[0]["boxes"][:2],
                 "scores": preds[0]["scores"][:2],
                 "labels": preds[0]["labels"][:2]}]
    manual_g = [{"boxes": gts[0]["boxes"][:2], "labels": np.zeros(2,
                                                                  np.int64)}]
    want = argo2_eval(manual_p, manual_g, classes)
    assert got == want
    assert got["mAP"] == 1.0 and got["CDS"] > 0.8
    del rng

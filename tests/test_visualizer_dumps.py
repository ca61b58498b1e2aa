"""Meshlab OBJ dumps (reference mmdet3d/core/visualizer/show_result.py)."""

import os

import numpy as np

from sst_tpu.utils.visualizer import (show_result, write_boxes_obj,
                                      write_points_obj)


def test_show_result_writes_objs(tmp_path):
    pts = np.random.RandomState(0).randn(200, 4).astype(np.float32)
    gt = np.array([[1, 2, 0.5, 4, 2, 1.5, 0.3]])
    pred = np.array([[5, -3, 0.2, 4.2, 1.9, 1.4, -0.2],
                     [0, 0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    out = show_result(pts, gt, pred, str(tmp_path), "frame0")
    txt = open(os.path.join(out, "frame0_gt.obj")).read()
    assert txt.count("\nf ") == 12 and txt.count("v ") == 8
    # bottom-center -> gravity-center: mean vertex z = 0.5 + 1.5/2
    zs = [float(l.split()[3]) for l in txt.splitlines() if l.startswith("v ")]
    assert abs(np.mean(zs) - 1.25) < 1e-6
    ptxt = open(os.path.join(out, "frame0_pred.obj")).read()
    assert ptxt.count("v ") == 16  # two boxes
    assert os.path.exists(os.path.join(out, "frame0_points.obj"))


def test_points_obj_colors(tmp_path):
    pts = np.zeros((3, 6), np.float32)
    pts[:, 3:] = [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    f = write_points_obj(pts, str(tmp_path / "p.obj"))
    lines = open(f).read().splitlines()
    assert lines[0].endswith("255 0 0") and len(lines) == 3


def test_boxes_obj_yaw_rotation(tmp_path):
    # yaw=pi/2 swaps the box footprint extents
    f = write_boxes_obj(np.array([[0, 0, 0, 4.0, 2.0, 1.0, np.pi / 2]]),
                        str(tmp_path / "b.obj"))
    verts = np.array([[float(v) for v in l.split()[1:]]
                      for l in open(f) if l.startswith("v ")])
    ext = verts.max(0) - verts.min(0)
    np.testing.assert_allclose(ext, [2.0, 4.0, 1.0], atol=1e-6)

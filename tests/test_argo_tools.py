"""tools/argo: devkit-free AV2 converter, anno gather, feather eval CLI."""

import glob
import os
import pickle
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow.feather as feather
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_av2(root, split="val", n_seg=2, n_frames=3):
    rng = np.random.RandomState(0)
    for s in range(n_seg):
        seg = root / split / f"log{s:02d}"
        (seg / "sensors" / "lidar").mkdir(parents=True)
        annos = []
        for f in range(n_frames):
            ts = 1000 + f
            pts = pd.DataFrame(dict(
                x=rng.uniform(-20, 20, 500).astype(np.float32),
                y=rng.uniform(-20, 20, 500).astype(np.float32),
                z=rng.uniform(-1, 2, 500).astype(np.float32),
                intensity=rng.rand(500).astype(np.float32),
            ))
            feather.write_feather(pts, seg / "sensors" / "lidar"
                                  / f"{ts}.feather")
            yaw = 0.4
            annos.append(dict(
                timestamp_ns=ts, category="REGULAR_VEHICLE",
                tx_m=5.0 + f, ty_m=2.0, tz_m=0.5,
                length_m=4.5, width_m=2.0, height_m=1.6,
                qw=np.cos(yaw / 2), qx=0.0, qy=0.0, qz=np.sin(yaw / 2),
                num_interior_pts=12, track_uuid=f"t{s}",
            ))
        feather.write_feather(pd.DataFrame(annos),
                              seg / "annotations.feather")


def test_argo2_converter_and_eval(tmp_path):
    make_av2(tmp_path)
    out = tmp_path / "converted"
    out.mkdir()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/argo/argo2_converter.py"),
         "--root", str(tmp_path), "--out", str(out), "--splits", "val"],
        check=True, capture_output=True, env=env,
    )
    with open(out / "argo2_infos_val.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 6
    a = infos[0]["annos"]
    assert a["name"][0] == "Regular_vehicle"
    # quat(yaw=0.4) → lidar yaw = -0.4 - pi/2
    np.testing.assert_allclose(a["rotation_y"][0], -0.4 - np.pi / 2,
                               atol=1e-5)
    np.testing.assert_allclose(a["dimensions"][0], [2.0, 4.5, 1.6])
    bins = glob.glob(str(out / "training" / "velodyne" / "*.bin"))
    assert len(bins) == 6
    pts = np.fromfile(bins[0], np.float32).reshape(-1, 4)
    assert pts.shape == (500, 4)

    gt_feather = tmp_path / "val_anno.feather"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools/argo/gather_argo2_anno_feather.py"),
         "--root", str(tmp_path), "--out", str(gt_feather)],
        check=True, capture_output=True, env=env,
    )
    gts = feather.read_table(gt_feather).to_pandas()
    assert len(gts) == 6 and "log_id" in gts

    # perfect predictions = gt with score column → CDS ≈ 1
    preds = gts.copy()
    preds["score"] = 0.9
    pred_feather = tmp_path / "preds.feather"
    feather.write_feather(preds, pred_feather)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/argo/eval_feather.py"),
         "--pred", str(pred_feather), "--gt", str(gt_feather)],
        check=True, capture_output=True, text=True, env=env,
    )
    import json

    metrics = json.loads(res.stdout)
    assert metrics["mAP"] > 0.99
    assert metrics["CDS"] > 0.9

"""Smoke test for the synthetic-protocol calibration tool: oracle arm must
hit the ceiling, noise arms must be monotonically worse, and the JSON
artifact must carry the interpretation bands."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_calibrate_synthetic_tool(tmp_path):
    out = str(tmp_path / "calib.json")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools/analysis_tools/calibrate_synthetic.py"),
         "--val-scenes", "2", "--num-points", "16384", "--out", out],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.load(open(out))
    for c in ("Car", "Pedestrian", "Cyclist"):
        arms = d["arms"]
        assert arms["oracle"][c]["L1_mAP"] == 100.0
        assert (arms["oracle"][c]["L1_mAP"] >= arms["xyz_0.1m"][c]["L1_mAP"]
                >= arms["xyz_0.3m"][c]["L1_mAP"]
                >= arms["xyz_0.5m"][c]["L1_mAP"])
        # dropping 20% of boxes caps recall: mAP must fall well below 100
        assert arms["drop_20pct"][c]["L1_mAP"] < 95.0
        assert d["interpretation"][c]["insensitive_band_mAP"] >= 0.0
        assert d["scene_stats"][c]["boxes_per_frame"] > 0

"""FSD++ offline seed generation: base-detector results → per-frame seeds.

Counterpart of /root/reference/tools/fsdpp/*: group a detection Objects bin
(or raw-output pkl from WaymoDataset.save_raw_output) by frame and save the
seed dict the IncrementalWaymoDataset feeds into TwoStageFSDPP
(seed_boxes/labels/scores per frame, keyed by (context, timestamp)).

Usage:
  python tools/fsdpp/generate_seeds.py --bin dets.bin --out seeds.pkl \
      [--score-thr 0.3]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bin", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--score-thr", type=float, default=0.0)
    args = ap.parse_args()

    from sst_tpu.core.waymo_bin import read_waymo_bin, waymo_box_to_lidar

    objs = read_waymo_bin(args.bin)
    frames: dict = {}
    type2label = {1: 0, 2: 1, 4: 2}
    for o in objs:
        if o["score"] < args.score_thr:
            continue
        key = (o["context_name"], o["timestamp_micros"])
        fr = frames.setdefault(key, dict(boxes=[], labels=[], scores=[]))
        fr["boxes"].append(waymo_box_to_lidar(o["box"]))
        fr["labels"].append(type2label.get(o.get("type", 0), 0))
        fr["scores"].append(o["score"])
    out = {
        k: dict(
            boxes=np.stack(v["boxes"]) if v["boxes"] else np.zeros((0, 7), np.float32),
            labels=np.asarray(v["labels"], np.int32),
            scores=np.asarray(v["scores"], np.float32),
        )
        for k, v in frames.items()
    }
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote seeds for {len(out)} frames to {args.out}")


if __name__ == "__main__":
    main()

"""Seeds from a Waymo submission bin — the tracking/ensemble seed source
for FSD++ (e.g. seeds exported by CTRL or a leaderboard submission).

Counterpart of /root/reference/tools/fsdpp/create_seed_boxes_from_bin.py:
reads a metrics_pb2.Objects bin (our devkit-free codec in
core/waymo_bin.py), converts each WOD box back to the lidar 7-dof frame
(center_z -> bottom, heading -> yaw, w/l swap — waymo_box_to_lidar), and
keys frames by sample_idx via the converter's idx2timestamp.pkl map, the
same mapping file the reference script loads.

Output seed format matches the other two seed tools (boxes/labels/scores
per sample-idx key), which is what IncrementalWaymoDataset consumes.

Usage:
  python tools/fsdpp/create_seed_boxes_from_bin.py \
      --bin work_dirs/fsd/results_val.bin \
      --idx2ts data/waymo/kitti_format/idx2timestamp.pkl --out seeds.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from sst_tpu.core.waymo_bin import read_bin_as_frames  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bin", required=True, help="metrics_pb2.Objects bin")
    ap.add_argument("--idx2ts", required=True,
                    help="idx2timestamp.pkl from the Waymo converter")
    ap.add_argument("--out", required=True)
    ap.add_argument("--score-thr", type=float, default=0.0)
    args = ap.parse_args()
    assert not os.path.exists(args.out), f"{args.out} exists"

    with open(args.idx2ts, "rb") as f:
        idx2ts = pickle.load(f)
    ts2idx = {ts: idx for idx, ts in idx2ts.items()}

    frames = read_bin_as_frames(args.bin)
    seeds = {}
    skipped = 0
    for (_, ts), fr in sorted(frames.items(), key=lambda kv: kv[0][1]):
        idx = ts2idx.get(ts)
        if idx is None:
            skipped += 1
            continue
        keep = fr["scores"] >= args.score_thr
        if not keep.any():
            continue
        seeds[str(idx)] = dict(
            boxes=fr["boxes"][keep].astype(np.float32),
            labels=fr["labels"][keep].astype(np.int32),
            scores=fr["scores"][keep].astype(np.float32),
        )

    with open(args.out, "wb") as f:
        pickle.dump(seeds, f)
    print(f"wrote bin seeds for {len(seeds)} frames -> {args.out}"
          + (f" ({skipped} frames not in idx2ts map)" if skipped else ""))


if __name__ == "__main__":
    main()

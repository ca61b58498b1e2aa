"""CTRL offline step 1: tracker-result bins → per-tracklet training inputs.

Counterpart of /root/reference/tools/ctrl/generate_track_input.py: read the
tracker's WOD Objects bin (with object ids), group into LiDARTracklets,
transform each track's per-frame boxes into world frame with ego poses, and
save a pkl of tracklets (+ per-frame point-crop indices computed lazily at
train time by the dataset).

Usage:
  python tools/ctrl/generate_track_input.py --bin track_results.bin \
      --poses poses.pkl --out tracklets.pkl [--min-len 2] [--type 1]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bin", required=True)
    ap.add_argument("--poses", default=None,
                    help="pkl: {context_name: {timestamp: 4x4 pose}}")
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-len", type=int, default=2)
    ap.add_argument("--type", type=int, default=None,
                    help="keep only this WOD type (1 veh / 2 ped / 4 cyc)")
    args = ap.parse_args()

    from sst_tpu.core.tracklet import LiDARTracklet

    trks = LiDARTracklet.from_waymo_bin(args.bin, min_len=args.min_len)
    if args.type is not None:
        trks = [t for t in trks if t.type_id == args.type]
    if args.poses:
        with open(args.poses, "rb") as f:
            poses = pickle.load(f)
        trks = [t.to_world(poses[t.context_name]) for t in trks
                if t.context_name in poses]
    with open(args.out, "wb") as f:
        pickle.dump(trks, f)
    print(f"wrote {len(trks)} tracklets to {args.out}")


if __name__ == "__main__":
    main()

"""Track extension: extrapolate each track backward (and optionally to every
frame of its sequence) at constant velocity, with geometrically decayed
scores — recovers the early frames a tracker misses before CTRL refinement.

Counterpart of /root/reference/tools/ctrl/extend_tracks.py (yaml config →
CLI flags; the velocity/extension math lives in
sst_tpu/core/tracklet.py extend/extend_all, mirroring
lidar_tracklet.py:633-785).

Usage:
  python tools/ctrl/extend_tracks.py --bin tracks.bin \
      --kitti-root data/waymo/kitti_format \
      [--extend-length 10 --min-length 5 --score-multiplier 0.9 \
       --velo-window 10 --extend-all --min-length-extend-all 40]
"""

from __future__ import annotations

import argparse

from utils import generate_tracklets, load_pose_maps

from sst_tpu.core.tracklet import tracklets_to_bin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bin", required=True)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--extend-length", type=int, default=10)
    p.add_argument("--min-length", type=int, default=5)
    p.add_argument("--score-multiplier", type=float, default=0.9)
    p.add_argument("--velo-window", type=int, default=10)
    p.add_argument("--extend-all", action="store_true")
    p.add_argument("--min-length-extend-all", type=int, default=40)
    args = p.parse_args()

    ts2pose, context2ts = load_pose_maps(args.kitti_root)
    tracklets = generate_tracklets(args.bin)
    print(f"{len(tracklets)} tracks loaded")

    out = []
    n_added = 0
    for trk in tracklets:
        world = trk.to_world(ts2pose)
        full_ts = context2ts[trk.context_name]
        before = len(world)
        if args.extend_all and len(world) > args.min_length_extend_all:
            world = world.extend_all(
                full_ts, args.min_length_extend_all,
                args.score_multiplier, args.velo_window,
            )
        else:
            world = world.extend(
                args.extend_length, "backward", full_ts, args.min_length,
                args.score_multiplier, args.velo_window,
            )
        n_added += len(world) - before
        out.append(world.to_ego(ts2pose))

    save = args.out or args.bin.replace(".bin", "_extended.bin")
    tracklets_to_bin(out, save)
    print(f"extended {len(out)} tracks by {n_added} boxes -> {save}")


if __name__ == "__main__":
    main()

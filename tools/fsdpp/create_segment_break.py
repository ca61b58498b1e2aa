"""Shard a Waymo info pkl at sequence boundaries for parallel sequential
evaluation (each worker owns whole sequences, never splitting one).

Counterpart of /root/reference/tools/fsdpp/create_segment_break.py: frame
ids follow the waymo-kitti convention image_idx = seq*1000 + frame, so a
sequence starts wherever image_idx % 1000 == 0.

Usage:
  python tools/fsdpp/create_segment_break.py \
      --info data/waymo/kitti_format/waymo_infos_val.pkl --num-shards 8
"""

from __future__ import annotations

import argparse
import json
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--info", required=True)
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with open(args.info, "rb") as f:
        infos = pickle.load(f)

    starts = [i for i, info in enumerate(infos)
              if info["image"]["image_idx"] % 1000 == 0]
    assert starts and starts[0] == 0, "infos must begin at a sequence start"
    per = max(1, -(-len(starts) // args.num_shards))
    breaks = [starts[s] for s in range(0, len(starts), per)]
    breaks.append(len(infos))
    for b in breaks[:-1]:
        assert infos[b]["image"]["image_idx"] % 1000 == 0

    print(json.dumps(dict(num_frames=len(infos), num_sequences=len(starts),
                          breaks=breaks)))
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(breaks, f)


if __name__ == "__main__":
    main()

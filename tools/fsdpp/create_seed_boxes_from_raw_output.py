"""Seeds from a raw prediction dump (tools/test.py --out) — the inference
seed source for FSD++ when no tracking bin exists.

Counterpart of /root/reference/tools/fsdpp/create_seed_boxes_from_raw_output
.py: the reference keys by the sample_idx each result carries; our dump is
ordered like the dataset, so the info pkl supplies the frame keys.

Usage:
  python tools/fsdpp/create_seed_boxes_from_raw_output.py \
      --raw work_dirs/fsd/preds.pkl \
      --info data/waymo/kitti_format/waymo_infos_val.pkl --out seeds.pkl
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
    ap.add_argument("--raw", required=True)
    ap.add_argument("--info", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--score-thr", type=float, default=0.0)
    args = ap.parse_args()
    assert not os.path.exists(args.out), f"{args.out} exists"

    with open(args.raw, "rb") as f:
        raw = pickle.load(f)
    with open(args.info, "rb") as f:
        infos = pickle.load(f)
    assert len(raw) == len(infos), (
        f"{len(raw)} results vs {len(infos)} infos — dump must cover the "
        "whole split in dataset order")

    seeds = {}
    for result, info in zip(raw, infos):
        boxes = np.asarray(result["boxes"], np.float32)
        if len(boxes) == 0:
            continue
        scores = np.asarray(result["scores"], np.float32)
        keep = scores >= args.score_thr
        if not keep.any():
            continue
        key = f"{info['image']['image_idx']:07d}"
        seeds[key] = dict(
            boxes=boxes[keep, :7], labels=np.asarray(
                result["labels"], np.int32)[keep],
            scores=scores[keep],
        )

    with open(args.out, "wb") as f:
        pickle.dump(seeds, f)
    print(f"wrote prediction seeds for {len(seeds)} frames -> {args.out}")


if __name__ == "__main__":
    main()

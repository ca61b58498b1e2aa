"""Merge several WOD Objects bins into one (e.g. per-class CTRL outputs).

Counterpart of /root/reference/tools/ctrl/merge_bins.py, on the repo's
devkit-free bin codec.

Usage: python tools/ctrl/merge_bins.py --bins a.bin b.bin --out merged.bin
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from utils import read_bin_as_frames  # noqa: F401  (re-export path setup)

from sst_tpu.core.waymo_bin import write_waymo_bin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bins", nargs="+", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    assert not os.path.exists(args.out), f"{args.out} already exists"

    merged: dict = {}
    for path in args.bins:
        for (cx, ts), fr in read_bin_as_frames(path).items():
            if (cx, ts) in merged:
                m = merged[(cx, ts)]
                m["boxes"] = np.concatenate([m["boxes"], fr["boxes"]])
                m["scores"] = np.concatenate([m["scores"], fr["scores"]])
                m["labels"] = np.concatenate([m["labels"], fr["labels"]])
                m["obj_ids"] = m["obj_ids"] + fr["obj_ids"]
            else:
                merged[(cx, ts)] = dict(fr)

    frames = [
        dict(boxes=fr["boxes"], scores=fr["scores"], labels=fr["labels"],
             obj_ids=fr["obj_ids"], context_name=cx, timestamp_micros=ts)
        for (cx, ts), fr in merged.items()
    ]
    write_waymo_bin(args.out, frames)
    n = sum(len(f["boxes"]) for f in frames)
    print(f"merged {len(args.bins)} bins: {n} objects -> {args.out}")


if __name__ == "__main__":
    main()

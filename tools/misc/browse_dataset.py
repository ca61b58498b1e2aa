"""Dump BEV renderings of dataset samples (reference
tools/misc/browse_dataset.py — open3d window replaced by headless PNG +
meshlab OBJ dumps, the TPU-VM-friendly form).

Usage:
  python tools/misc/browse_dataset.py CONFIG --output-dir work_dirs/browse \
      [--synthetic] [--num 10] [--objs]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main():
    sys.path.insert(0, ".")
    p = argparse.ArgumentParser(description="Browse a dataset as BEV PNGs")
    p.add_argument("config")
    p.add_argument("--output-dir", default="work_dirs/browse")
    p.add_argument("--num", type=int, default=10)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no real data needed)")
    p.add_argument("--objs", action="store_true",
                   help="also write meshlab OBJ dumps per sample")
    args = p.parse_args()

    from sst_tpu.train.data_setup import build_train_dataset
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config
    from sst_tpu.utils.visualizer import show_bev, show_result

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg, train=False)
    dataset, _, kind, _ = build_train_dataset(cfg, model, synthetic=args.synthetic)
    os.makedirs(args.output_dir, exist_ok=True)
    n = min(args.num, len(dataset))
    for i in range(n):
        s = dataset[i]
        pts = np.asarray(s["points"])
        valid = np.asarray(s.get("points_valid", np.ones(len(pts), bool)))
        gt = np.asarray(s.get("gt_boxes", np.zeros((0, 7))))
        gtv = np.asarray(s.get("gt_valid", np.ones(len(gt), bool)))
        show_bev(pts[valid], gt_boxes=gt[gtv],
                 out_file=os.path.join(args.output_dir, f"sample_{i:04d}.png"))
        if args.objs:
            show_result(pts[valid], gt[gtv], None, args.output_dir,
                        f"sample_{i:04d}")
    print(f"wrote {n} {kind} samples to {args.output_dir}")


if __name__ == "__main__":
    main()

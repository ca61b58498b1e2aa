"""Concatenate every val segment's annotations.feather into one gt feather
for the CDS evaluator (counterpart of
/root/reference/tools/argo/gather_argo2_anno_feather.py).

Usage:
  python tools/argo/gather_argo2_anno_feather.py --root <av2>/sensor \
      --out val_anno.feather [--split val]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="val")
    args = p.parse_args()

    import pandas as pd
    import pyarrow.feather as feather

    seg_paths = sorted(glob.glob(os.path.join(args.root, args.split, "*")))
    parts = []
    for seg in seg_paths:
        path = os.path.join(seg, "annotations.feather")
        if not os.path.exists(path):
            continue
        df = feather.read_table(path).to_pandas()
        df["log_id"] = os.path.basename(seg)
        parts.append(df)
    gts = pd.concat(parts).reset_index(drop=True)
    feather.write_feather(gts, args.out)
    print(f"gathered {len(gts)} annotations from {len(parts)} segments "
          f"-> {args.out}")


if __name__ == "__main__":
    main()

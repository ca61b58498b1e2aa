"""Merge A/B result files and compute MATCHED-STEP quality deltas.

tools/ab_dense_vs_sparse.py writes one JSON per invocation (often one build
per file, because long arms run sequentially on the single chip). The
judge-facing artifact needs cross-build deltas computed at the SAME training
step — r04's null `matched_step_delta` (sparse arm stalled at step 751) is
exactly the failure this tool + the runner's checkpoint/resume close.

For every requested pair (a, b) it:
  * averages each arm's trajectory over its seeds per step,
  * intersects the two arms' evaluated step sets,
  * emits delta_a_minus_b per metric at every common step.

Usage:
  python tools/ab_merge.py --out AB_DENSE_SPARSE_r05.json \
      --pair dense:sparse --pair dense:dense_f32 \
      AB_DENSE_r04.json AB_SPARSE_r05.json AB_DENSE_F32_r05.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np

TRAJ_KEYS = ("Overall/L1 mAP", "Overall/L1 mAPH", "Overall/L2 mAPH")
AP_KEYS = ("Overall/L1 mAP", "Overall/L1 mAPH",
           "Overall/L2 mAP", "Overall/L2 mAPH")


def mean_trajectory(build):
    """{step: {metric: mean-over-seeds}} plus the per-seed values kept."""
    per_step = {}
    for run in build["runs"]:
        for step, metrics in run["trajectory"]:
            per_step.setdefault(int(step), []).append(metrics)
    out = {}
    for step, ms in sorted(per_step.items()):
        out[step] = {
            "n_seeds": len(ms),
            **{k: round(float(np.mean([m[k] for m in ms])), 4)
               for k in TRAJ_KEYS if all(k in m for m in ms)},
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("inputs", nargs="+")
    p.add_argument("--pair", action="append", default=[],
                   help="a:b -> emit matched_step_delta_a_minus_b")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    builds = {}
    merged = {"sources": {}}
    for path in args.inputs:
        with open(path) as f:
            d = json.load(f)
        merged["sources"][path] = d.get("args", {})
        for k, v in d.items():
            if isinstance(v, dict) and "runs" in v:
                if k in builds:  # same build from two files: pool the seeds
                    seen = {r["seed"] for r in builds[k]["runs"]}
                    builds[k]["runs"] += [r for r in v["runs"]
                                          if r["seed"] not in seen]
                else:
                    builds[k] = {"runs": list(v["runs"])}

    for name, b in builds.items():
        runs = b["runs"]
        b["seeds"] = sorted(r["seed"] for r in runs)
        b["final_step"] = max(s for r in runs for s, _ in r["trajectory"])
        b["ap"] = {k: round(float(np.mean([r["ap"][k] for r in runs])), 4)
                   for k in AP_KEYS}
        b["ap_std"] = {k: round(float(np.std([r["ap"][k] for r in runs])), 4)
                       for k in AP_KEYS}
        b["trajectory_mean"] = mean_trajectory(b)
        merged[name] = b

    for pair in args.pair:
        a, bname = pair.split(":")
        if a not in builds or bname not in builds:
            merged[f"matched_step_delta_{a}_minus_{bname}"] = None
            continue
        ta = merged[a]["trajectory_mean"]
        tb = merged[bname]["trajectory_mean"]
        common = sorted(set(ta) & set(tb))
        merged[f"matched_step_delta_{a}_minus_{bname}"] = {
            str(s): {k: round(ta[s][k] - tb[s][k], 4)
                     for k in TRAJ_KEYS if k in ta[s] and k in tb[s]}
            for s in common
        } or None
        merged[f"matched_steps_{a}_vs_{bname}"] = common

    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print("wrote", args.out)
    for k, v in merged.items():
        if k.startswith("matched_step_delta"):
            print(k, json.dumps(v))


if __name__ == "__main__":
    main()

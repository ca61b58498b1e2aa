"""Inference FPS benchmark CLI — counterpart of the reference's
tools/analysis_tools/benchmark.py (:30-90: warmup + timed loop, single
device).

Usage:
  python tools/analysis_tools/benchmark.py configs/fsdv2/fsdv2_waymo_1x.py \
      [--samples 200] [--warmup 10] [--num-points 196608]

Timing uses the slope method (see bench.py): on the axon remote TPU,
block_until_ready does not synchronize; only host fetches drain the queue.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--num-points", type=int, default=196608)
    args = p.parse_args()

    import jax

    import sst_tpu.models  # noqa: F401
    from sst_tpu.flagship import synthetic_waymo_batch
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg, train=False)
    pcr = cfg["model"].get("point_cloud_range",
                           (-74.88, -74.88, -2, 74.88, 74.88, 4))
    batch = synthetic_waymo_batch(
        1, args.num_points, num_extra_feats=2, pcr_half=float(pcr[3]) - 0.2
    )
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "shuffle": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda b: model.init(init_rngs, b, train=False))(batch)
    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))

    out = predict(variables, batch)
    float(jax.tree_util.tree_leaves(out)[0].sum())  # compile + first run

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        out = predict(variables, batch)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    ta = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.samples + args.warmup):
        out = predict(variables, batch)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    tb = time.perf_counter() - t0

    # slope: (time of warmup+samples iters) - (time of warmup iters)
    per = (tb - ta) / args.samples
    fps = 1.0 / per
    print(json.dumps({
        "config": args.config,
        "fps": round(fps, 3),
        "p50_latency_ms": round(per * 1e3, 2),
        "num_points": args.num_points,
    }))


if __name__ == "__main__":
    main()

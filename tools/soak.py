"""Train-at-scale soak on the real chip (VERDICT r2 next-#10).

Runs a few hundred flagship-scale train steps (FSDv2 dense flagship and/or
SST) on synthetic labeled scenes and asserts the production invariants:
  - every loss finite at every logged step
  - zero cap-overflow counters (any metric named *overflow*/*dropped*)
  - zero recompiles after the first step (jit cache size stays 1)
  - steady-state step time recorded (mean + p90 over the logged tail)

Writes a JSON log next to --out (committed in-repo as soak evidence).

Usage (real chip):
  python tools/soak.py --model fsdv2 --steps 300 --out SOAK_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def soak(model_name: str, steps: int, num_points: int, scene_pool: int):
    import jax

    from sst_tpu.flagship import (
        fsdv2_waymo,
        sst_waymo,
        synthetic_labeled_batch,
        synthetic_waymo_batch,
    )
    from sst_tpu.train import (
        create_train_state,
        make_jitted_train_step,
        make_optimizer,
    )

    if model_name == "fsdv2":
        model = fsdv2_waymo(max_points=num_points)

        def mk(seed):
            return synthetic_labeled_batch(
                1, num_points, seed=seed, num_extra_feats=2,
                pcr_half=79.8)[0]
    elif model_name == "fsd_dense":
        import sst_tpu.models  # noqa: F401
        from sst_tpu.utils.builders import build_model_from_cfg
        from sst_tpu.utils.config import load_config

        model = build_model_from_cfg(
            load_config("configs/fsd/fsd_waymoD1_1x_dense.py"), train=True)

        def mk(seed):
            return synthetic_labeled_batch(
                1, num_points, seed=seed, num_extra_feats=2,
                pcr_half=79.8)[0]
    elif model_name == "sst":
        model = sst_waymo(max_points=num_points, train_buckets=True)

        def mk(seed):
            return synthetic_waymo_batch(1, num_points, seed=seed)
    else:
        raise ValueError(model_name)

    batches = [mk(s) for s in range(scene_pool)]
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1),
         "sampler": jax.random.PRNGKey(2), "seeds": jax.random.PRNGKey(3)},
        b, train=False))(batches[0])
    state = create_train_state(
        model, variables, make_optimizer(base_lr=1e-4, total_steps=steps))
    step = make_jitted_train_step(model)

    log = {"model": model_name, "steps": steps, "num_points": num_points,
           "losses": [], "overflow_keys": {}, "step_ms": []}
    t_prev = time.time()
    for i in range(steps):
        state, metrics = step(state, batches[i % scene_pool],
                              jax.random.PRNGKey(100 + i))
        if i % 25 == 0 or i == steps - 1:
            # host fetch drains the queue (axon); amortized step time
            lt = float(metrics["loss_total"])
            now = time.time()
            if i > 0:
                log["step_ms"].append(round((now - t_prev) / 25 * 1e3, 1))
            t_prev = now
            log["losses"].append(round(lt, 3))
            assert np.isfinite(lt), f"non-finite loss at step {i}"
            for k, v in metrics.items():
                if "overflow" in k or "dropped" in k:
                    log["overflow_keys"].setdefault(k, 0.0)
                    log["overflow_keys"][k] += float(v)
            print(f"step {i}: loss={lt:.3f}", flush=True)
    try:
        log["jit_cache_size"] = int(step._cache_size())
    except Exception:
        log["jit_cache_size"] = None
    tail = log["step_ms"][len(log["step_ms"]) // 2:]
    log["steady_step_ms_mean"] = round(float(np.mean(tail)), 1) if tail else None
    log["steady_step_ms_p90"] = round(float(np.percentile(tail, 90)), 1) \
        if tail else None
    return log


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="fsdv2",
                   choices=("fsdv2", "sst", "fsd_dense"))
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--num-points", type=int, default=196608)
    p.add_argument("--scene-pool", type=int, default=16)
    p.add_argument("--out", default="SOAK_r03.json")
    args = p.parse_args()

    from sst_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    log = soak(args.model, args.steps, args.num_points, args.scene_pool)
    ok = True
    overflowing = {k: v for k, v in log["overflow_keys"].items() if v > 0}
    if overflowing:
        ok = False
        print("OVERFLOW COUNTERS NONZERO:", overflowing)
    if log["jit_cache_size"] not in (None, 1):
        ok = False
        print(f"RECOMPILES: jit cache size {log['jit_cache_size']} != 1")
    log["ok"] = ok
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[args.model] = log
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(("SOAK OK" if ok else "SOAK FAILED"),
          f"steady step {log['steady_step_ms_mean']} ms -> {args.out}")


if __name__ == "__main__":
    main()

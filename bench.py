"""End-to-end inference benchmark on the flagship SST-Waymo model.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

The reference publishes no in-repo FPS (SURVEY §6); its measurement tool is
tools/analysis_tools/benchmark.py (single GPU, batch 1, warmup+loop) and
community-reported SST-Waymo inference on high-end GPUs is ~10 FPS. We use
ASSUMED_REF_FPS = 10.0 as the vs_baseline denominator until a measured
reference number replaces it.
"""

from __future__ import annotations

import json
import time

ASSUMED_REF_FPS = 10.0


def main():
    import jax

    from sst_tpu.flagship import sst_waymo, synthetic_waymo_batch

    num_points = 196608
    model = sst_waymo(max_points=num_points, max_voxels=65536, train_buckets=False)
    batch = synthetic_waymo_batch(batch_size=1, num_points=num_points)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    @jax.jit
    def predict(variables, batch):
        return model.apply(variables, batch, method=model.predict)

    # warmup + compile
    out = predict(variables, batch)
    jax.block_until_ready(out)

    iters = 20
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = predict(variables, batch)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    fps = 1.0 / p50
    print(
        json.dumps(
            {
                "metric": "sst_waymo_e2e_inference_fps_batch1",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / ASSUMED_REF_FPS, 3),
                "p50_latency_ms": round(p50 * 1e3, 2),
                "num_points": num_points,
                "note": "synthetic Waymo-density frame; vs_baseline uses assumed 10 FPS A100 reference",
            }
        )
    )


if __name__ == "__main__":
    main()

"""Dense-BEV vs sparse-UNet FSDv2 quality A/B at flagship caps.

The benched flagship (flagship.fsdv2_waymo, models/dense_bev.py) replaces
the reference's sparse 3D UNet + sparse mixer with a z-packed dense 2D BEV
UNet — a topology departure. This tool trains BOTH builds on the same
realistic-synthetic labeled scenes (flagship.synthetic_labeled_batch: gt
boxes generate their own surface points, full capacity caps — not the 16^3
toy grids of tests/test_convergence.py), evaluates L1/L2 mAP/mAPH on
held-out scenes with the internal Waymo protocol, and records the delta —
the quality-parity evidence behind the dense-BEV headline FPS
(VERDICT r2 weak #2 / next-#1b).

Usage (real chip, ~40 min at defaults):
  python tools/ab_dense_vs_sparse.py --out AB_DENSE_SPARSE_r03.json
Smoke (tiny grids, CPU):
  python tools/ab_dense_vs_sparse.py --tiny --steps 40 --out /tmp/ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def predictions_to_frames(pred, batch_size):
    """model.predict output → per-frame eval dicts (valid-masked)."""
    out = []
    boxes = np.asarray(pred["boxes"])
    scores = np.asarray(pred["scores"])
    labels = np.asarray(pred["labels"])
    valid = np.asarray(pred["valid"]) & (scores > 0)
    for i in range(batch_size):
        m = valid[i]
        out.append(dict(boxes=boxes[i][m], scores=scores[i][m],
                        labels=labels[i][m]))
    return out


def run_build(name, model, scene_kw, args):
    import jax

    from sst_tpu.core.eval_waymo import waymo_eval
    from sst_tpu.flagship import synthetic_labeled_batch
    from sst_tpu.train import (
        create_train_state,
        make_jitted_train_step,
        make_optimizer,
    )
    from sst_tpu.train.schedules import FSDDetectionSchedule

    t_start = time.time()
    # pre-generate the scene pool once: host-side generation per step would
    # leave the chip idle (~1 s/scene of numpy at full caps)
    pool = [synthetic_labeled_batch(seed=s, **scene_kw)[0]
            for s in range(args.train_scenes)]
    print(f"[{name}] scene pool ready ({time.time() - t_start:.0f}s)",
          flush=True)
    batch0 = pool[0]
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0),
             "shuffle": jax.random.PRNGKey(1),
             "sampler": jax.random.PRNGKey(2),
             "seeds": jax.random.PRNGKey(3)}, b, train=False))(batch0)
    state = create_train_state(
        model, variables,
        make_optimizer(base_lr=args.lr, total_steps=args.steps))

    # seg-only warmup then detection; buffer_start=0 keeps it to TWO
    # compiled step variants (each flagship compile is minutes on the
    # remote backend)
    sched = FSDDetectionSchedule(enable_after=args.warmup, buffer_start=0.0,
                                 delay_buffer_until=args.warmup)
    # FSD two-stage's loss has no seg-pretrain phase (reference trains it
    # end to end); pass only the kwargs its signature accepts
    import inspect

    loss_params = inspect.signature(model.loss).parameters
    step_fns = {}
    losses = []
    for step in range(args.steps):
        kw = {k: v for k, v in sched(step).items() if k in loss_params}
        key = tuple(sorted(kw.items()))
        if key not in step_fns:
            step_fns[key] = make_jitted_train_step(model, loss_kwargs=kw)
        batch = pool[step % args.train_scenes]
        state, metrics = step_fns[key](state, batch,
                                       jax.random.PRNGKey(1000 + step))
        if step % 20 == 0 or step == args.steps - 1:
            lt = float(metrics["loss_total"])
            losses.append(round(lt, 3))
            print(f"[{name}] step {step}: loss={lt:.3f} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
            assert np.isfinite(lt), f"{name} diverged at step {step}"

    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))
    preds, gts = [], []
    for v in range(args.val_scenes):
        batch, meta = synthetic_labeled_batch(seed=10_000 + v, **scene_kw)
        pred = predict({"params": state.params,
                        "batch_stats": state.batch_stats}, batch)
        preds.extend(predictions_to_frames(pred, scene_kw["batch_size"]))
        gts.extend(meta)
    ap = waymo_eval(preds, gts, classes=("Car", "Pedestrian", "Cyclist"))
    wall = time.time() - t_start
    print(f"[{name}] done in {wall:.0f}s  L2 mAPH={ap['Overall/L2 mAPH']}",
          flush=True)
    return {"ap": ap, "loss_curve": losses, "wall_s": round(wall, 1)}


def _fsd_from_cfg(path):
    import sst_tpu.models  # noqa: F401  (registry population)
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config

    return build_model_from_cfg(load_config(path), train=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--warmup", type=int, default=150)
    p.add_argument("--train-scenes", type=int, default=64)
    p.add_argument("--val-scenes", type=int, default=24)
    p.add_argument("--num-points", type=int, default=196608)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--builds", default="dense,sparse")
    p.add_argument("--z-groups", type=int, default=0,
                   help="override dense build z_groups (0 = flagship default)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny grids on CPU (script smoke test)")
    p.add_argument("--out", default="AB_DENSE_SPARSE.json")
    args = p.parse_args()

    if args.tiny:
        # CPU-only smoke: must not touch (or fight over) the TPU claim.
        # JAX_PLATFORMS env alone is overridden by the axon sitecustomize;
        # jax.config after import is the working lever (tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sst_tpu.flagship import (
        fsdv2_waymo,
        tiny_fsdv2_dense,
        tiny_fsdv2_flagship,
    )

    if args.tiny:
        builders = {"dense": tiny_fsdv2_dense, "sparse": tiny_fsdv2_flagship}
        scene_kw = dict(batch_size=1, num_points=4096, num_extra_feats=2,
                        pcr_half=3.9, num_objects=6, size_scale=0.35)
    else:
        import jax.numpy as jnp

        from sst_tpu.flagship import fsdv2_waymo_dense

        dense_kw = ({"z_groups": args.z_groups} if args.z_groups else {})
        builders = {
            "dense": lambda: fsdv2_waymo_dense(max_points=args.num_points,
                                               **dense_kw),
            # legacy full-column z collapse (round-3 A/B loser); kept so the
            # z-grouped fix's delta stays reproducible
            "dense_z1": lambda: fsdv2_waymo_dense(max_points=args.num_points,
                                                  z_groups=1),
            "sparse": lambda: fsdv2_waymo(max_points=args.num_points,
                                          backbone="sparse"),
            # bf16 compute-policy flagship: quality A/B for the bandwidth-
            # halving dtype before it can become the measured default
            "dense_bf16": lambda: fsdv2_waymo_dense(
                max_points=args.num_points, dtype=jnp.bfloat16, **dense_kw),
            # FSD two-stage pair: same segmentor swap, validated directly
            # on the heaviest family (configs/fsd/fsd_waymoD1_1x_dense.py)
            "fsd_dense": lambda: _fsd_from_cfg(
                "configs/fsd/fsd_waymoD1_1x_dense.py"),
            "fsd_sparse": lambda: _fsd_from_cfg(
                "configs/fsd/fsd_waymoD1_1x.py"),
        }
        scene_kw = dict(batch_size=1, num_points=args.num_points,
                        num_extra_feats=2, pcr_half=79.8, num_objects=48)

    results = {"args": vars(args), "scene_kw": {
        k: v for k, v in scene_kw.items()}}
    for b in args.builds.split(","):
        results[b] = run_build(b, builders[b](), scene_kw, args)
    for dk, sk, label in (("dense", "sparse", "delta_dense_minus_sparse"),
                          ("dense_bf16", "dense", "delta_bf16_minus_f32"),
                          ("fsd_dense", "fsd_sparse",
                           "delta_fsd_dense_minus_sparse")):
        if dk in results and sk in results:
            d = results[dk]["ap"]
            s = results[sk]["ap"]
            results[label] = {
                k: round(d[k] - s[k], 4)
                for k in ("Overall/L1 mAP", "Overall/L1 mAPH",
                          "Overall/L2 mAP", "Overall/L2 mAPH")}
            print(f"{label}:", json.dumps(results[label]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

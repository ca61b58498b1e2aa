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


_POOLS = {}  # (kind, n, frozen scene_kw) -> list — shared across builds/seeds


def _np_batch(b):
    """Device PointBatch -> numpy-leaf PointBatch (host RAM, not HBM; jit
    transfers ~4 MB/step, negligible next to a 300-4000 ms train step)."""
    import jax

    return jax.tree_util.tree_map(np.asarray, b)


def get_pools(scene_kw, n_train, n_val):
    """Train/val scene pools, generated once per scene_kw and shared across
    every (build, seed) run: at 256 full-cap scenes the numpy generation is
    minutes of host time, and the scenes are deliberately IDENTICAL across
    seeds (seed variance should measure init/shuffle noise, not data
    resampling)."""
    from sst_tpu.flagship import synthetic_labeled_batch

    # in-memory key must include the counts (matching the disk-cache hash):
    # a second call with different counts would otherwise return the wrong
    # pool sizes
    kw_key = tuple(sorted(scene_kw.items()))
    key = (kw_key, n_train, n_val)
    if key not in _POOLS:
        import hashlib
        import pickle

        t0 = time.time()
        # disk cache: generation costs ~2-3 s/scene of host numpy (14 min
        # for 256 full-cap scenes on this 1-vCPU box) and the pools are
        # pure functions of (scene_kw, counts); hash layout kept stable so
        # pre-existing caches still hit
        h = hashlib.sha1(
            repr((kw_key, n_train, n_val)).encode()).hexdigest()[:16]
        cache = f"/tmp/sst_ab_pool_{h}.pkl"
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                _POOLS[key] = pickle.load(f)
            print(f"[pool] loaded {cache} ({time.time() - t0:.0f}s)",
                  flush=True)
            return _POOLS[key]
        train = [_np_batch(synthetic_labeled_batch(seed=s, **scene_kw)[0])
                 for s in range(n_train)]
        val = [synthetic_labeled_batch(seed=10_000 + v, **scene_kw)
               for v in range(n_val)]
        val = [(_np_batch(b), meta) for b, meta in val]
        print(f"[pool] {n_train} train + {n_val} val scenes ready "
              f"({time.time() - t0:.0f}s)", flush=True)
        _POOLS[key] = (train, val)
        with open(cache, "wb") as f:
            pickle.dump(_POOLS[key], f)
    return _POOLS[key]


def run_build(name, model, scene_kw, args, seed: int = 0):
    import jax

    from sst_tpu.core.eval_waymo import waymo_eval
    from sst_tpu.train import (
        create_train_state,
        make_jitted_train_step,
        make_optimizer,
    )
    from sst_tpu.train.schedules import FSDDetectionSchedule

    pool, val_pool = get_pools(scene_kw, args.train_scenes, args.val_scenes)
    # wall budget starts AFTER pool generation/load: the budget bounds
    # device time, and the one-off host pool build must not eat it
    t_start = time.time()
    batch0 = pool[0]
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(seed),
             "shuffle": jax.random.PRNGKey(seed + 1),
             "sampler": jax.random.PRNGKey(seed + 2),
             "seeds": jax.random.PRNGKey(seed + 3)}, b, train=False))(batch0)
    state = create_train_state(
        model, variables,
        make_optimizer(base_lr=args.lr, total_steps=args.steps))

    # ---- checkpoint/resume (VERDICT r04 weak #6): every wall-capped or
    # crashed long arm resumes from its last orbax save instead of zeroing
    start_step, losses, trajectory, prior_wall = 0, [], [], 0.0
    ckpt_dir = prog_path = None
    fingerprint = {"build": name.split("@")[0], "seed": seed,
                   "steps": args.steps, "train_scenes": args.train_scenes,
                   "lr": args.lr, "num_points": args.num_points,
                   "warmup": args.warmup}
    if args.ckpt_every:
        ckpt_dir = os.path.join(args.ckpt_dir, name.replace("@", "_"))
        os.makedirs(ckpt_dir, exist_ok=True)
        prog_path = os.path.join(ckpt_dir, "progress.json")
    if args.resume and prog_path and os.path.exists(prog_path):
        import orbax.checkpoint as ocp

        with open(prog_path) as f:
            prog = json.load(f)
        if prog["fingerprint"] != fingerprint:
            raise SystemExit(
                f"[{name}] refusing to resume: checkpoint fingerprint "
                f"{prog['fingerprint']} != current {fingerprint} "
                f"(use --no-resume or a fresh --ckpt-dir)")
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(
            os.path.abspath(os.path.join(ckpt_dir, f"step_{prog['step']}")),
            state)
        start_step = int(prog["step"])
        losses = prog["losses"]
        trajectory = [tuple(t) for t in prog["trajectory"]]
        prior_wall = float(prog["wall_s"])
        print(f"[{name}] resumed from step {start_step} "
              f"({prior_wall:.0f}s accumulated)", flush=True)

    def save_ckpt(st, step_done, extra=None):
        if not ckpt_dir:
            return
        import orbax.checkpoint as ocp
        import shutil

        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step_done}"))
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, st, force=True)
        ckptr.wait_until_finished()
        prog = {"step": step_done, "losses": losses,
                "trajectory": trajectory, "fingerprint": fingerprint,
                "wall_s": prior_wall + (time.time() - t_start)}
        if extra:
            prog.update(extra)
        tmp = prog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(prog, f)
        os.replace(tmp, prog_path)
        # keep the two most recent step dirs (older ones only waste disk)
        steps_on_disk = sorted(
            int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
            if d.startswith("step_") and not d.endswith(".tmp"))
        for s in steps_on_disk[:-2]:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                          ignore_errors=True)
        print(f"[{name}] checkpointed step {step_done}", flush=True)

    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))

    def evaluate(st):
        preds, gts = [], []
        for batch, meta in val_pool:
            pred = predict({"params": st.params,
                            "batch_stats": st.batch_stats}, batch)
            preds.extend(predictions_to_frames(pred, scene_kw["batch_size"]))
            gts.extend(meta)
        return waymo_eval(preds, gts,
                          classes=("Car", "Pedestrian", "Cyclist"))

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
    shuffle_rng = np.random.RandomState(seed + 17)
    order = shuffle_rng.permutation(args.train_scenes)
    pos = 0
    # deterministic fast-forward of the data order to the resume point:
    # replays exactly the loop's consumption pattern, so a resumed run sees
    # the identical scene sequence a never-interrupted run would have
    for _ in range(start_step):
        if pos >= args.train_scenes:
            order = shuffle_rng.permutation(args.train_scenes)
            pos = 0
        pos += 1
    step = max(start_step - 1, 0)
    stopped_early = None
    for step in range(start_step, args.steps):
        kw = {k: v for k, v in sched(step).items() if k in loss_params}
        key = tuple(sorted(kw.items()))
        if key not in step_fns:
            step_fns[key] = make_jitted_train_step(model, loss_kwargs=kw)
        if pos >= args.train_scenes:  # reshuffle each epoch (seed-dependent)
            order = shuffle_rng.permutation(args.train_scenes)
            pos = 0
        batch = pool[order[pos]]
        pos += 1
        state, metrics = step_fns[key](
            state, batch, jax.random.PRNGKey(seed * 100_000 + step))
        if step % 50 == 0 or step == args.steps - 1:
            lt = float(metrics["loss_total"])
            losses.append(round(lt, 3))
            print(f"[{name}] step {step}: loss={lt:.3f} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
            assert np.isfinite(lt), f"{name} diverged at step {step}"
        if (args.eval_every and step > args.warmup
                and (step + 1) % args.eval_every == 0
                and step != args.steps - 1):
            ap_t = evaluate(state)
            trajectory.append(
                (step + 1, {k: ap_t[k] for k in
                            ("Overall/L1 mAP", "Overall/L1 mAPH",
                             "Overall/L2 mAPH")}))
            print(f"[{name}] step {step + 1}: "
                  f"L1 mAPH={ap_t['Overall/L1 mAPH']}", flush=True)
        if (args.ckpt_every and (step + 1) % args.ckpt_every == 0
                and step != args.steps - 1):
            save_ckpt(state, step + 1)
        if args.max_wall_s and time.time() - t_start > args.max_wall_s:
            stopped_early = step + 1
            print(f"[{name}] wall budget hit at step {step + 1}", flush=True)
            save_ckpt(state, step + 1,
                      extra={"stopped_early_at_step": step + 1})
            break

    ap = evaluate(state)
    trajectory.append(
        (step + 1, {k: ap[k] for k in ("Overall/L1 mAP", "Overall/L1 mAPH",
                                       "Overall/L2 mAPH")}))
    if stopped_early is None and args.ckpt_every:
        save_ckpt(state, step + 1, extra={"completed": True})
    wall = prior_wall + (time.time() - t_start)
    print(f"[{name}] done in {wall:.0f}s  L2 mAPH={ap['Overall/L2 mAPH']}",
          flush=True)
    out = {"ap": ap, "loss_curve": losses, "wall_s": round(wall, 1),
           "seed": seed, "trajectory": trajectory}
    if stopped_early is not None:
        out["stopped_early_at_step"] = stopped_early
    return out


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
    p.add_argument("--seeds", default="0",
                   help="comma list of init/shuffle seeds per build")
    p.add_argument("--eval-every", type=int, default=0,
                   help="held-out eval every N steps (mAPH trajectory)")
    p.add_argument("--max-wall-s", type=int, default=0,
                   help="per-invocation wall budget (pool build excluded); "
                        "a run past it checkpoints and stops early so one "
                        "slow arm can't sink the A/B — relaunch with "
                        "--resume to continue")
    p.add_argument("--ckpt-every", type=int, default=250,
                   help="orbax-checkpoint the train state every N steps "
                        "(0 disables); interrupted arms resume instead of "
                        "restarting from zero")
    p.add_argument("--ckpt-dir", default="/tmp/sst_ab_ckpt")
    p.add_argument("--resume", action="store_true",
                   help="resume each (build, seed) arm from its latest "
                        "checkpoint under --ckpt-dir when one exists")
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

    from sst_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

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
            # dtype arms: "dense" above IS the bf16 flagship policy (the
            # flagship.py default); dense_f32 isolates the dtype delta,
            # dense_bf16 kept as an alias for older result files
            "dense_f32": lambda: fsdv2_waymo_dense(
                max_points=args.num_points, dtype=jnp.float32, **dense_kw),
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

    seeds = [int(s) for s in args.seeds.split(",")]
    results = {"args": vars(args), "scene_kw": {
        k: v for k, v in scene_kw.items()}}
    keys = ("Overall/L1 mAP", "Overall/L1 mAPH",
            "Overall/L2 mAP", "Overall/L2 mAPH")
    for b in args.builds.split(","):
        runs = []
        for sd in seeds:
            tag = b if len(seeds) == 1 else f"{b}@s{sd}"
            runs.append(run_build(tag, builders[b](), scene_kw, args,
                                  seed=sd))
            # checkpoint partial results after every run: a crash or wall
            # timeout keeps every completed (build, seed) on disk
            results[b] = {
                "runs": runs,
                "ap": {k: round(float(np.mean([r["ap"][k] for r in runs])),
                                4) for k in keys},
                "ap_std": {k: round(float(np.std([r["ap"][k] for r in runs])),
                                    4) for k in keys},
            }
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
    # dtype ablation: "dense" IS the bf16 flagship default since r04, so
    # the f32 arm is the explicitly-f32 build (the old dense_bf16-vs-dense
    # pair compared bf16 to itself and measured seed noise)
    for dk, sk, label in (("dense", "sparse", "delta_dense_minus_sparse"),
                          ("dense", "dense_f32", "delta_bf16_minus_f32"),
                          ("fsd_dense", "fsd_sparse",
                           "delta_fsd_dense_minus_sparse")):
        if dk in results and sk in results:
            d = results[dk]["ap"]
            s = results[sk]["ap"]
            results[label] = {k: round(d[k] - s[k], 4) for k in keys}
            print(f"{label}:", json.dumps(results[label]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

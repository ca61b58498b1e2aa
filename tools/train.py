"""Training CLI — the counterpart of the reference's tools/train.py.

Usage:
  python tools/train.py configs/sst/sst_waymoD5_3class.py \
      --work-dir work_dirs/sst --max-steps 1000 [--cfg-options k.a=v]

Single-process, multi-device via pjit DP over all local devices (replacing
torch.distributed.launch + DDP). Checkpointing via orbax.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default="work_dirs/default")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no real data needed)")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--ckpt-interval", type=int, default=1000)
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run validation every N steps (the reference's "
                        "evaluation=dict(interval=...) EvalHook); 0 = the "
                        "config's evaluation.interval_steps or off")
    p.add_argument("--eval-samples", type=int, default=32,
                   help="cap on validation samples per in-train eval")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--expect-devices", type=int, default=0,
                   help="assert this many local devices are visible "
                        "(dist_train.sh chip-count argument; 0 = any)")
    p.add_argument("--train-step", default="auto",
                   choices=("auto", "pjit", "shard_map"),
                   help="step wiring: 'shard_map' is the DDP-exact step "
                        "(train/step.py:make_shard_map_train_step) that "
                        "keeps the fused Pallas kernels (window-MHA, sorted "
                        "segment-reduce) ON per shard across a multi-chip "
                        "mesh; 'pjit' lets XLA partition the step (Pallas "
                        "fast paths fall back to their XLA builds under "
                        "multi-device pjit). 'auto' = shard_map on "
                        "multi-device meshes, pjit single-device.")
    # multi-host launch (reference: torch.distributed.launch multi-node env
    # in tools/dist_train.sh:8). One train.py process per host; on Cloud TPU
    # pods --coordinator alone suffices (num-processes/process-id resolved
    # from the TPU metadata by jax.distributed.initialize).
    p.add_argument("--coordinator",
                   default=os.environ.get("SST_TPU_COORDINATOR"),
                   help="host:port of process 0; enables "
                        "jax.distributed.initialize multi-host training")
    p.add_argument("--num-processes", type=int,
                   default=int(os.environ.get("SST_TPU_NUM_PROCESSES", "0")),
                   help="total number of train.py processes (0 = auto)")
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("SST_TPU_PROCESS_ID", "0")))
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # The axon sitecustomize pins JAX_PLATFORMS=axon; honor an explicit
    # override (e.g. SST_TPU_PLATFORM=cpu for the virtual 8-device mesh).
    # Must run before the first jax.devices() call — backend init is sticky.
    if os.environ.get("SST_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SST_TPU_PLATFORM"])
    from sst_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.coordinator:
        # multi-host: every process joins the coordination service before
        # backend init; jax.devices() becomes the GLOBAL device set and the
        # mesh/pjit collectives span hosts (DCN). Single-process dry-run:
        # --coordinator localhost:<port> --num-processes 1.
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.num_processes else None,
        )

    if args.expect_devices and len(jax.devices()) != args.expect_devices:
        raise SystemExit(
            f"--expect-devices {args.expect_devices} but "
            f"{len(jax.devices())} visible: {jax.devices()}")
    import numpy as np

    import sst_tpu.models  # noqa: F401 (register)
    from sst_tpu.data.loader import DataLoader
    from sst_tpu.data.pipelines import build_pipeline
    from sst_tpu.train import (
        create_train_state,
        make_data_mesh,
        make_jitted_train_step,
        make_optimizer,
        shard_batch,
    )
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config, set_by_dotted

    cfg = load_config(args.config)
    for opt in args.cfg_options:
        k, v = opt.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        set_by_dotted(cfg, k, v)

    os.makedirs(args.work_dir, exist_ok=True)
    model = build_model_from_cfg(cfg, train=True)

    data_cfg = cfg.get("data", {})
    batch_size = data_cfg.get("samples_per_device", 1) * jax.local_device_count()

    from sst_tpu.train.data_setup import build_train_dataset

    dataset, collate, ds_kind, train_pipeline_cfg = build_train_dataset(
        cfg, model, synthetic=args.synthetic, seed=args.seed,
        batch_size=batch_size,
    )
    loader_kw = {} if collate is None else {"collate": collate}
    loader = DataLoader(dataset, batch_size=batch_size, seed=args.seed,
                        num_shards=jax.process_count(),
                        shard_id=jax.process_index(), **loader_kw)
    total_steps = args.max_steps or cfg.get("schedule", {}).get("max_steps", 10000)
    opt_cfg = cfg.get("optimizer", {})
    tx = make_optimizer(
        base_lr=opt_cfg.get("base_lr", 1e-5),
        weight_decay=opt_cfg.get("weight_decay", 0.05),
        total_steps=total_steps,
        clip_norm=opt_cfg.get("clip_norm", 10.0),
    )

    sample_batch = next(iter(loader))
    init_fn = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(args.seed),
             "shuffle": jax.random.PRNGKey(args.seed + 1)},
            b, train=False,
        )
    )
    variables = init_fn(sample_batch)
    state = create_train_state(model, variables, tx)

    if args.resume_from:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.resume_from), state)
        state = restored

    mesh = make_data_mesh()
    # FSD warmup/threshold-buffer schedule (fsd_hooks.py equivalent): one
    # compiled step variant per distinct (pretrain, thr_extra) pair.
    sched = None
    if "fsd_detection_schedule" in cfg:
        from sst_tpu.train.schedules import FSDDetectionSchedule

        sched = FSDDetectionSchedule(**cfg["fsd_detection_schedule"])
    step_fns: dict = {}

    import inspect

    loss_params = set(inspect.signature(model.loss).parameters)

    # step wiring (--train-step): on a multi-device mesh the default is the
    # DDP-exact shard_map step, which keeps the Pallas fast paths on per
    # shard (the pjit partitioner can't split a pallas_call, so under pjit
    # those kernels run their XLA fallback builds). Single-device keeps the
    # plain jit step — identical numbers, no shard_map tracing overhead.
    n_mesh_devices = int(mesh.devices.size)
    use_shard_map = (args.train_step == "shard_map"
                     or (args.train_step == "auto" and n_mesh_devices > 1))
    print(f"train step wiring: "
          f"{'shard_map (DDP-exact)' if use_shard_map else 'pjit'} over "
          f"{n_mesh_devices} device(s)", flush=True)

    def get_step_fn(s):
        kw = sched(s) if sched is not None else {}
        kw = {k: v for k, v in kw.items() if k in loss_params}
        key = tuple(sorted(kw.items()))
        if key not in step_fns:
            if use_shard_map:
                from sst_tpu.train.step import make_shard_map_train_step

                step_fns[key] = make_shard_map_train_step(
                    model, mesh, loss_kwargs=kw or None)
            else:
                step_fns[key] = make_jitted_train_step(model, mesh,
                                                       loss_kwargs=kw or None)
        return step_fns[key]

    # DisableAugmentationHook equivalent: strip aug transforms from the
    # dataset pipeline when the boundary step is crossed (fsd_hooks.py:6;
    # the loader re-reads dataset.pipeline each epoch, replacing the
    # reference's dataloader-restart hack).
    aug_sched = None
    if "disable_aug_schedule" in cfg and ds_kind == "waymo":
        from sst_tpu.train.schedules import DisableAugmentationSchedule

        aug_sched = DisableAugmentationSchedule(**cfg["disable_aug_schedule"])

    # in-train evaluation (reference EvalHook): a separate test-caps model
    # build shares the train params; the internal AP protocol scores a
    # bounded number of val samples every eval_interval steps.
    eval_interval = args.eval_interval or cfg.get(
        "evaluation", {}).get("interval_steps", 0)
    eval_model = val_ds = val_classes = eval_predict = None
    if eval_interval:
        from sst_tpu.train.data_setup import build_val_dataset

        eval_model = build_model_from_cfg(cfg, train=False)
        val_ds, val_classes = build_val_dataset(
            cfg, model, synthetic=args.synthetic,
            num_samples=args.eval_samples)
        if val_ds is None:
            print("in-train eval disabled: no val dataset for "
                  f"data.dataset={cfg.get('data', {}).get('dataset')!r} "
                  "(set data.val_info_path)", flush=True)
            eval_interval = 0
        else:
            eval_predict = jax.jit(lambda v, b: eval_model.apply(
                v, b, method=eval_model.predict))

    def run_eval(state):
        import numpy as np

        from sst_tpu.core.evaluation import eval_ap
        from sst_tpu.data.loader import DataLoader

        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        preds, gts = [], []
        vloader = DataLoader(val_ds, batch_size=1, shuffle=False,
                             drop_last=False)
        for bi, vb in enumerate(vloader):
            if bi >= args.eval_samples:
                break
            out = eval_predict(variables, vb)
            for i in range(vb.points.shape[0]):
                ok = np.asarray(out["valid"][i])
                preds.append({
                    "boxes": np.asarray(out["boxes"][i])[ok][:, :7],
                    "scores": np.asarray(out["scores"][i])[ok],
                    "labels": np.asarray(out["labels"][i])[ok]})
                gv = np.asarray(vb.gt_valid[i])
                gts.append({"boxes": np.asarray(vb.gt_boxes[i])[gv][:, :7],
                            "labels": np.asarray(vb.gt_labels[i])[gv]})
        return eval_ap(preds, gts, val_classes)

    log_path = os.path.join(args.work_dir, "train_log.jsonl")
    # TensorBoard scalars next to the jsonl (reference default_runtime.py:5-11
    # TensorboardLoggerHook); flax's writer needs tensorflow, so it is
    # optional — the jsonl stays the source of truth.
    tb = None
    try:
        from flax.metrics import tensorboard as _tbmod

        tb = _tbmod.SummaryWriter(os.path.join(args.work_dir, "tb"))
    except Exception as e:  # pragma: no cover - tf not installed
        print(f"tensorboard writer disabled: {e!r}", flush=True)

    step = int(state.step)
    t0 = time.time()
    with mesh, open(log_path, "a") as logf:
        while step < total_steps:
            if aug_sched is not None and step >= aug_sched.disable_after_step:
                dataset.pipeline = build_pipeline(
                    aug_sched.filter_pipeline(train_pipeline_cfg, step)
                )
                aug_sched = None  # applied once
            for batch in loader:
                if step >= total_steps:
                    break
                sb = shard_batch(batch, mesh)
                state, metrics = get_step_fn(step)(
                    state, sb, jax.random.PRNGKey(step))
                step += 1
                if step % args.log_interval == 0 or step == 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["step"] = step
                    m["wall"] = round(time.time() - t0, 1)
                    logf.write(json.dumps(m) + "\n")
                    logf.flush()
                    if tb is not None:
                        for k, v in m.items():
                            if k not in ("step", "wall"):
                                tb.scalar(k, v, step)
                    print(
                        f"step {step}/{total_steps} "
                        f"loss={m['loss_total']:.4f} ({m['wall']}s)",
                        flush=True,
                    )
                if eval_interval and (step % eval_interval == 0
                                      or step == total_steps):
                    em = run_eval(state)
                    em = {f"val/{k}": float(v) for k, v in em.items()
                          if isinstance(v, (int, float))}
                    em["step"] = step
                    logf.write(json.dumps(em) + "\n")
                    logf.flush()
                    if tb is not None:
                        for k, v in em.items():
                            if k != "step":
                                tb.scalar(k, v, step)
                    head = {k: round(v, 4) for k, v in list(em.items())[:6]}
                    print(f"eval @ {step}: {head}", flush=True)
                if step % args.ckpt_interval == 0 or step == total_steps:
                    import orbax.checkpoint as ocp

                    ckptr = ocp.StandardCheckpointer()
                    path = os.path.abspath(
                        os.path.join(args.work_dir, f"ckpt_{step}")
                    )
                    ckptr.save(path, state, force=True)
                    ckptr.wait_until_finished()
                    print(f"saved {path}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Evaluation CLI — counterpart of the reference's tools/test.py.

Usage:
  python tools/test.py configs/sst/sst_waymoD5_3class.py <ckpt-dir> \
      [--synthetic] [--eval ap3d]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-samples", type=int, default=16)
    p.add_argument("--eval", default="ap3d",
                   choices=["ap3d", "apbev", "waymo", "seg", "none"],
                   help="'seg' = per-point mIoU/acc protocol "
                        "(core/eval_seg.py) for segmentor / seg-pretrain "
                        "configs; gt labels derive from gt-box containment "
                        "exactly like the seg training targets")
    p.add_argument("--matcher", default="greedy",
                   choices=["greedy", "hungarian"],
                   help="--eval waymo matching scheme (hungarian = "
                        "official per-cutoff bipartite matching; slower)")
    p.add_argument("--out", default=None, help="write predictions (pkl)")
    p.add_argument(
        "--sequential", action="store_true",
        help="FSD++ sequential mode: visit frames in time order; frame t's "
             "detections seed frame t+1 (reference reuse_simple_test, "
             "two_stage_fsdpp.py:357). Needs data.dataset=waymo_incremental.",
    )
    return p.parse_args()


def run_sequential(args, cfg, model, data_cfg):
    import jax
    import numpy as np

    from sst_tpu.data.incremental_dataset import (
        IncrementalWaymoDataset,
        collate_temporal,
        run_sequential_eval,
    )

    dataset = IncrementalWaymoDataset(
        data_root=data_cfg["data_root"],
        info_path=data_cfg.get("val_info_path", data_cfg.get("info_path")),
        seeds_path=data_cfg.get("seeds_path"),
        num_previous_frames=data_cfg.get("num_previous_frames", 6),
        max_points=data_cfg.get("max_points", 262144),
        max_seeds=data_cfg.get("max_seeds", 256),
        max_gt=data_cfg.get("max_gt", 128),
        load_dim=data_cfg.get("load_dim", 6),
        use_dim=tuple(data_cfg.get("use_dim", (0, 1, 2, 3, 4))),
        test_mode=True,
    )
    batch0 = collate_temporal([dataset[0]])
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "seeds": jax.random.PRNGKey(1)},
            b, train=False,
        )
    )(batch0)
    variables = maybe_restore(args, model, variables)
    predict = jax.jit(lambda b: model.apply(variables, b, method=model.predict))
    results = run_sequential_eval(
        dataset, predict, score_thr=data_cfg.get("seed_score_thr", 0.1)
    )
    print(f"sequential eval: {len(results)} frames", flush=True)
    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(results, f)
    if args.eval != "none":
        import json

        from sst_tpu.core.evaluation import eval_ap

        preds, gts = [], []
        for r in results:
            preds.append({k: r[k] for k in ("boxes", "scores", "labels")})
            s = dataset[r["idx"]]
            gv = s["gt_valid"]
            gts.append({"boxes": s["gt_boxes"][gv][:, :7],
                        "labels": s["gt_labels"][gv]})
        mode = "3d" if args.eval == "ap3d" else "bev"
        res = eval_ap(preds, gts, list(dataset.classes), mode=mode)
        print(json.dumps({f"AP_{mode}": res}))


def maybe_restore(args, model, variables):
    if not args.checkpoint:
        return variables
    import os

    import orbax.checkpoint as ocp

    from sst_tpu.train import create_train_state, make_optimizer

    tx = make_optimizer()
    state = create_train_state(model, variables, tx)
    state = ocp.StandardCheckpointer().restore(
        os.path.abspath(args.checkpoint), state
    )
    return {"params": state.params, "batch_stats": state.batch_stats}


def main():
    args = parse_args()
    import jax

    if os.environ.get("SST_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SST_TPU_PLATFORM"])
    from sst_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    import sst_tpu.models  # noqa: F401
    from sst_tpu.core.evaluation import eval_ap
    from sst_tpu.data.datasets import SyntheticDataset, WaymoDataset
    from sst_tpu.data.loader import DataLoader
    from sst_tpu.data.pipelines import build_pipeline
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model = build_model_from_cfg(cfg, train=False)
    cap = cfg.get("capacity", {})
    max_points = cap.get("max_points", 65536)
    data_cfg = cfg.get("data", {})

    if args.sequential:
        run_sequential(args, cfg, model, data_cfg)
        return

    if args.synthetic or data_cfg.get("dataset") == "synthetic":
        dataset = SyntheticDataset(
            num_samples=args.num_samples, num_points=min(max_points, 32768),
            pc_range=model.point_cloud_range,
            pipeline=build_pipeline([
                dict(type="PointsRangeFilter", point_cloud_range=model.point_cloud_range),
                dict(type="PadToCap", max_points=max_points),
            ]),
            seed=999,
        )
        classes = list(dataset.CLASSES)
    else:
        ds_kind = data_cfg.get("dataset", "waymo")
        if ds_kind == "nuscenes":
            from sst_tpu.data.datasets import NuScenesDataset as DsCls
        elif ds_kind == "argo2":
            from sst_tpu.data.datasets import Argo2Dataset as DsCls
        else:
            DsCls = WaymoDataset
        dataset = DsCls(
            data_root=data_cfg["data_root"],
            info_path=data_cfg["val_info_path"],
            pipeline=build_pipeline([
                dict(type="PointsRangeFilter", point_cloud_range=model.point_cloud_range),
                dict(type="PadToCap", max_points=max_points),
            ]),
            test_mode=True,
        )
        classes = list(dataset.classes)

    loader = DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False)

    sample = next(iter(loader))
    init_fn = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
            b, train=False,
        )
    )
    variables = maybe_restore(args, model, init_fn(sample))

    if args.eval == "seg":
        from sst_tpu.core.eval_seg import seg_eval

        predict_seg = jax.jit(
            lambda v, b: model.apply(v, b, method=model.predict_seg))
        gt_l, pred_l = [], []
        for batch in loader:
            out = predict_seg(variables, batch)
            for i in range(batch.points.shape[0]):
                valid = np.asarray(out["valid"][i])
                gt_l.append(np.asarray(out["gt"][i])[valid])
                pred_l.append(np.asarray(out["pred"][i])[valid])
        res = seg_eval(gt_l, pred_l, tuple(classes) + ("background",))
        print(json.dumps(res))
        return

    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))

    preds, gts = [], []
    for batch in loader:
        out = predict(variables, batch)
        for i in range(batch.points.shape[0]):
            valid = np.asarray(out["valid"][i])
            preds.append({
                "boxes": np.asarray(out["boxes"][i])[valid][:, :7],
                "scores": np.asarray(out["scores"][i])[valid],
                "labels": np.asarray(out["labels"][i])[valid],
            })
            gv = np.asarray(batch.gt_valid[i])
            gts.append({
                "boxes": np.asarray(batch.gt_boxes[i])[gv][:, :7],
                "labels": np.asarray(batch.gt_labels[i])[gv],
            })
    print(f"ran inference on {len(preds)} samples", flush=True)

    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(preds, f)

    if args.eval == "waymo":
        from sst_tpu.core.eval_waymo import waymo_eval

        res = waymo_eval(preds, gts, tuple(classes), matcher=args.matcher,
                         range_breakdowns=True)
        print(json.dumps(res))
    elif args.eval != "none":
        mode = "3d" if args.eval == "ap3d" else "bev"
        res = eval_ap(preds, gts, classes, mode=mode)
        print(json.dumps({f"AP_{mode}": res}))


if __name__ == "__main__":
    main()

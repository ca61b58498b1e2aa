"""High-level inference API — counterpart of the reference's
mmdet3d/apis/inference.py (:35 init_model, :72 inference_detector).

init_model builds a detector from a config (+ optional orbax checkpoint) and
returns (model, variables, predict_fn) with predict_fn jitted once;
inference_detector runs a single raw point cloud through range-filter +
pad-to-cap + the jitted predictor.
"""

from __future__ import annotations

import os

import numpy as np


def init_model(config_path: str, checkpoint: str | None = None,
               train: bool = False, seed: int = 0,
               num_point_features: int = 5):
    import jax

    import sst_tpu.models  # noqa: F401 (register)
    from sst_tpu.flagship import synthetic_waymo_batch
    from sst_tpu.utils.builders import build_model_from_cfg
    from sst_tpu.utils.config import load_config

    cfg = load_config(config_path)
    model = build_model_from_cfg(cfg, train=train)
    cap = cfg.get("capacity", {})
    max_points = cap.get("max_points", 65536)
    pcr = cfg["model"].get("point_cloud_range",
                           (-74.88, -74.88, -2, 74.88, 74.88, 4))
    sample = synthetic_waymo_batch(
        1, max_points, num_extra_feats=max(num_point_features - 3, 0),
        pcr_half=float(pcr[3]) - 0.2,
    )
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(seed),
         "shuffle": jax.random.PRNGKey(seed + 1)},
        b, train=False,
    ))(sample)
    if checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(checkpoint))
        # accept either a bare variables tree or a TrainState-like dict
        if "params" in restored:
            variables = {
                k: restored[k] for k in ("params", "batch_stats")
                if k in restored
            }
    predict = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))
    return model, variables, predict


def inference_detector(model, variables, predict, points: np.ndarray,
                       max_points: int | None = None):
    """points: raw [N, C] numpy cloud → dict(boxes, scores, labels, valid)
    for the single frame (inference.py:72)."""
    import jax.numpy as jnp

    from sst_tpu.models.detectors.dynamic_voxelnet import PointBatch

    pcr = model.point_cloud_range
    m = (
        (points[:, 0] >= pcr[0]) & (points[:, 0] < pcr[3])
        & (points[:, 1] >= pcr[1]) & (points[:, 1] < pcr[4])
        & (points[:, 2] >= pcr[2]) & (points[:, 2] < pcr[5])
    )
    pts = points[m]
    cap = max_points or 65536
    out = np.zeros((cap, points.shape[1]), np.float32)
    n = min(len(pts), cap)
    out[:n] = pts[:n]
    valid = np.zeros(cap, bool)
    valid[:n] = True
    g = 1
    batch = PointBatch(
        points=jnp.asarray(out[None]),
        valid=jnp.asarray(valid[None]),
        gt_boxes=jnp.zeros((1, g, 7), jnp.float32),
        gt_labels=jnp.zeros((1, g), jnp.int32),
        gt_valid=jnp.zeros((1, g), bool),
    )
    res = predict(variables, batch)
    return {k: np.asarray(v[0]) for k, v in res.items()}

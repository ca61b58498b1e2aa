"""Convergence regression tests (VERDICT round-1 item 9): overfit each model
family on one fixed tiny synthetic batch and assert the loss collapses and
the detector finds the objects. This is the only guard against silent
training breakage without real data; the reference's analog is its training
recipes reproducing published AP.
"""

import jax
import numpy as np
import pytest

from sst_tpu.core.evaluation import eval_ap
from sst_tpu.flagship import tiny_batch, tiny_fsdv2_dense, tiny_sst
from sst_tpu.train import create_train_state, make_jitted_train_step, make_optimizer

CLASSES = ["Car", "Pedestrian", "Cyclist"]


def _overfit(model, batch, steps=300, lr=3e-3, seed=0):
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    tx = make_optimizer(base_lr=lr, weight_decay=0.0, total_steps=steps)
    state = create_train_state(model, variables, tx)
    step = make_jitted_train_step(model)
    first = None
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(metrics["loss_total"])
    last = float(metrics["loss_total"])
    return state, first, last


def _ap(model, state, batch, mode="bev"):
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, method=model.predict,
    )
    preds, gts = [], []
    for i in range(batch.points.shape[0]):
        v = np.asarray(out["valid"][i])
        preds.append(dict(boxes=np.asarray(out["boxes"][i])[v][:, :7],
                          scores=np.asarray(out["scores"][i])[v],
                          labels=np.asarray(out["labels"][i])[v]))
        gv = np.asarray(batch.gt_valid[i])
        gts.append(dict(boxes=np.asarray(batch.gt_boxes[i])[gv][:, :7],
                        labels=np.asarray(batch.gt_labels[i])[gv]))
    thr = {c: 0.25 for c in CLASSES}
    res = eval_ap(preds, gts, CLASSES, mode=mode, iou_thresholds=thr)
    vals = [v for k, v in res.items() if k.endswith("AP") and np.isfinite(v)]
    return float(np.mean(vals)) if vals else 0.0


@pytest.mark.slow
def test_sst_overfits_tiny_batch():
    model = tiny_sst()
    batch = tiny_batch(batch_size=2, num_points=512, seed=7)
    state, first, last = _overfit(model, batch, steps=250)
    assert last < 0.5 * first, (first, last)
    assert _ap(model, state, batch) > 0.2


@pytest.mark.slow
def test_fsd_overfits_tiny_batch():
    from tests.test_fsd import make_batch, tiny_fsd

    model = tiny_fsd()
    batch = make_batch(np.random.RandomState(7))
    state, first, last = _overfit(model, batch, steps=250)
    assert last < 0.5 * first, (first, last)


@pytest.mark.slow
def test_fsdv2_sparse_overfits_tiny_batch():
    from tests.test_fsdv2 import tiny_fsdv2

    model = tiny_fsdv2()
    batch = tiny_batch(batch_size=2, num_points=512, seed=7)
    state, first, last = _overfit(model, batch, steps=250)
    assert last < 0.5 * first, (first, last)


@pytest.mark.slow
def test_fsdv2_dense_overfits_tiny_batch():
    model = tiny_fsdv2_dense()
    batch = tiny_batch(batch_size=2, num_points=512, seed=7)
    state, first, last = _overfit(model, batch, steps=250)
    assert last < 0.5 * first, (first, last)

"""CTRL tracklet detector tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models.ctrl import TrackletBatch, TrackletDetector  # noqa: F401
from sst_tpu.flagship import tiny_ctrl as tiny_tracklet_detector  # noqa: F401
from sst_tpu.flagship import tracklet_batch




def make_tracklet_batch(rng, b=2, p=512, f=8):
    return tracklet_batch(rng, b, p, f)


@pytest.fixture(scope="module")
def ctrl_setup():
    model = tiny_tracklet_detector()
    rng = np.random.RandomState(0)
    batch = make_tracklet_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_ctrl_loss_and_grads(ctrl_setup):
    model, variables, batch = ctrl_setup

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, method=model.loss, mutable=["batch_stats"],
        )
        return sum(v for k, v in out.items() if k.startswith("loss")), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss)), {k: float(v) for k, v in out.items()}
    assert float(out["mean_roi_iou"]) > 0.3  # near-gt rois must have high iou
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_ctrl_predict(ctrl_setup):
    model, variables, batch = ctrl_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape == (2, 8, 7)
    assert out["scores"].shape == (2, 8)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # refined boxes should stay near the (near-gt) tracker boxes
    d = np.abs(np.asarray(out["boxes"][..., :3] - batch.trk_boxes[..., :3]))
    assert d.mean() < 2.0

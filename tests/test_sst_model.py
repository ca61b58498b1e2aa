"""Integration smoke tests for the SST detector on tiny shapes (modeled on the
reference's test_detectors.py synthetic-input strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models import DynamicVoxelNet, PointBatch
from sst_tpu.ops.window import BucketSpec


def tiny_model():
    return DynamicVoxelNet(
        voxel_size=(0.4, 0.4, 6.0),
        point_cloud_range=(-6.4, -6.4, -2.0, 6.4, 6.4, 4.0),  # 32x32 grid
        max_voxels=512,
        max_total_windows=128,
        window_shape=(4, 4),
        buckets=(
            BucketSpec(8, 0, 8, 64),
            BucketSpec(16, 8, 100000, 32),
        ),
        vfe=dict(feat_channels=(16, 32)),
        backbone=dict(
            d_model=(32, 32), nhead=(2, 2), num_blocks=2,
            dim_feedforward=(64, 64), num_attached_conv=1,
            conv_kwargs=({"kernel_size": 3, "dilation": 1},),
            conv_out_channel=32, in_channel=32, remat_blocks=False,
        ),
        neck=dict(out_channels=(64,)),
        head=dict(
            num_classes=3, feat_channels=64,
            anchor_ranges=(
                (-6.4, -6.4, -0.0345, 6.4, 6.4, -0.0345),
                (-6.4, -6.4, -0.1188, 6.4, 6.4, -0.1188),
                (-6.4, -6.4, 0.0, 6.4, 6.4, 0.0),
            ),
        ),
        test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


def make_batch(rng, b=2, p=512, g=8):
    pts = rng.uniform(-6, 6, (b, p, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1, 2, (b, p))
    valid = rng.rand(b, p) > 0.1
    boxes = np.concatenate(
        [
            rng.uniform(-5, 5, (b, g, 2)),
            np.full((b, g, 1), -0.1),
            rng.uniform(0.8, 4.0, (b, g, 3)),
            rng.uniform(-np.pi, np.pi, (b, g, 1)),
        ],
        -1,
    ).astype(np.float32)
    labels = rng.randint(0, 3, (b, g)).astype(np.int32)
    gt_valid = np.ones((b, g), bool)
    return PointBatch(
        points=jnp.asarray(pts), valid=jnp.asarray(valid),
        gt_boxes=jnp.asarray(boxes), gt_labels=jnp.asarray(labels),
        gt_valid=jnp.asarray(gt_valid),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    return model, variables, batch


def test_forward_shapes(model_and_params):
    model, variables, batch = model_and_params
    preds = model.apply(variables, batch, train=False)
    assert preds["cls"].shape == (2, 32, 32, 6, 3)
    assert preds["reg"].shape == (2, 32, 32, 6, 7)
    assert preds["dir"].shape == (2, 32, 32, 6, 2)
    assert np.isfinite(np.asarray(preds["cls"])).all()


def test_loss_and_grads(model_and_params):
    model, variables, batch = model_and_params

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, method=model.loss,
            rngs={"shuffle": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return out["loss_cls"] + out["loss_bbox"] + out["loss_dir"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(out["num_pos"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_predict(model_and_params):
    model, variables, batch = model_and_params
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape == (2, 32, 7)
    assert out["labels"].shape == (2, 32)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_jit_forward(model_and_params):
    model, variables, batch = model_and_params
    f = jax.jit(lambda v, b: model.apply(v, b, train=False))
    preds = f(variables, batch)
    assert preds["cls"].shape[0] == 2

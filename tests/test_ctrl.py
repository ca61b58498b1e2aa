"""CTRL tracklet detector tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models.ctrl import TrackletBatch, TrackletDetector


def tiny_tracklet_detector():
    return TrackletDetector(
        segmentor=dict(
            point_cloud_range=(-3.2, -3.2, -4.0, 3.2, 3.2, 4.0),
            voxel_size=(0.2, 0.2, 0.4),
            max_voxels=512,
            unet_level_caps=(512, 256, 128),
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (16, 16)),
                decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16)),
            ),
        ),
        roi_head=dict(
            num_classes=1,
            max_inbox_point=32,
            bbox_head=dict(
                num_blocks=2,
                feat_channels=((32, 32),) * 2,
                rel_mlp_hidden=((8, 8),) * 2,
                reg_mlp=(64, 64),
                cls_mlp=(64, 64),
            ),
        ),
    )


def make_tracklet_batch(rng, b=2, p=512, f=8):
    # track-frame coords: object roughly at origin each frame
    pts = rng.randn(b, p, 3).astype(np.float32) * 1.0
    pts = np.clip(pts, -3.0, 3.0)
    inten = rng.rand(b, p, 2).astype(np.float32)
    ts = rng.randint(0, f, (b, p)).astype(np.int32)
    points = np.concatenate(
        [pts, inten, ts[..., None].astype(np.float32) * 0.1], -1
    )
    trk = np.concatenate(
        [rng.uniform(-0.5, 0.5, (b, f, 2)), np.full((b, f, 1), -1.0),
         np.tile([[.9, 2.0, 1.5]], (b, f, 1)) * rng.uniform(0.9, 1.1, (b, f, 3)),
         rng.uniform(-0.3, 0.3, (b, f, 1))], -1,
    ).astype(np.float32)
    gt = trk + rng.randn(b, f, 7).astype(np.float32) * 0.05
    return TrackletBatch(
        points=jnp.asarray(points),
        valid=jnp.ones((b, p), bool),
        frame_inds=jnp.asarray(ts),
        trk_boxes=jnp.asarray(trk),
        trk_scores=jnp.asarray(rng.rand(b, f).astype(np.float32)),
        trk_valid=jnp.ones((b, f), bool),
        labels=jnp.zeros((b,), jnp.int32),
        gt_boxes=jnp.asarray(gt),
        gt_valid=jnp.ones((b, f), bool),
    )


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

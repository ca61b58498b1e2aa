"""FSD++ tests: incremental residual ops, pose transforms, and the
TwoStageFSDPP detector loss/predict on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models.fsd import TemporalBatch, TwoStageFSDPP
from sst_tpu.ops.incremental import (
    box_frame_transform,
    delta_points_mask,
    points_frame_transform,
)
from sst_tpu.flagship import fsd_batch as make_batch  # noqa: F401
from sst_tpu.flagship import tiny_fsdpp, temporal_batch  # noqa: F401

PCR = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)


def test_points_frame_transform_roundtrip():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    th = 0.4
    pose = np.eye(4, dtype=np.float32)
    pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    pose[:3, 3] = [2.0, -1.0, 0.5]
    pose = jnp.asarray(pose)
    cur_inv = jnp.asarray(np.linalg.inv(np.asarray(pose)))
    # prev frame == current frame pose → identity
    out = points_frame_transform(pts, pose, cur_inv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_box_frame_transform_yaw():
    th = np.pi / 2
    pre_pose = np.eye(4, dtype=np.float32)
    pre_pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    cur_inv = jnp.asarray(np.eye(4, dtype=np.float32))
    boxes = jnp.asarray([[1.0, 0, 0, 2, 4, 1.5, 0.0]])
    out = np.asarray(box_frame_transform(boxes, jnp.asarray(pre_pose), cur_inv))
    # center rotates 90 deg: (1,0) -> (0,1)
    np.testing.assert_allclose(out[0, :2], [0, 1], atol=1e-5)
    # yaw decreases by rotation in mmdet3d convention: heading vec
    # (sin0, cos0)=(0,1) rotates to (-1,0) → atan2(-1,0) = -pi/2
    np.testing.assert_allclose(out[0, 6], -np.pi / 2, atol=1e-5)


def test_delta_points_mask():
    cur = jnp.asarray([[0.1, 0.1, 0.0], [5.0, 5.0, 0.0], [20.0, 0, 0]],
                      jnp.float32)
    prev = jnp.asarray([[0.15, 0.12, 0.05]], jnp.float32)
    m = np.asarray(delta_points_mask(
        cur, jnp.ones(3, bool), prev, jnp.ones(1, bool),
        (-8, -8, -2, 8, 8, 4), (0.4, 0.4, 0.4),
    ))
    assert not m[0]  # same voxel as prev → suppressed
    assert m[1]  # new voxel → residual
    assert m[2]  # out of range → kept




def make_temporal_batch(rng, b=2, p=1024, g=6, s=8):
    return temporal_batch(rng, b, p, g, s)


@pytest.fixture(scope="module")
def fsdpp_setup():
    model = tiny_fsdpp()
    rng = np.random.RandomState(4)
    batch = make_temporal_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "seeds": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    return model, variables, batch


def test_fsdpp_loss(fsdpp_setup):
    model, variables, batch = fsdpp_setup
    out, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, train=True, method=model.loss,
        rngs={"seeds": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    total = sum(v for k, v in out.items() if k.startswith("loss"))
    assert np.isfinite(float(total)), {k: float(v) for k, v in out.items()}
    assert float(out["num_input_points"]) > 0
    # residual selection must drop a noticeable share of raw points
    assert float(out["num_input_points"]) < batch.valid.sum()


def test_fsdpp_predict(fsdpp_setup):
    model, variables, batch = fsdpp_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_fsdpp_seed_aug_and_crop_caps():
    """fp insertion, seed dropping and crop subsampling (reference
    two_stage_fsdpp.py:843-844, :658-671) keep losses finite and respect
    the static seed-slot layout."""
    base = tiny_fsdpp()
    model = base.clone(fp_rate=0.5, seed_drop_rate=0.3, max_crop_points=8)
    rng = np.random.RandomState(7)
    batch = make_temporal_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "seeds": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    out, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, train=True, method=model.loss,
        rngs={"seeds": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(sum(v for k, v in out.items()
                                 if k.startswith("loss"))))

    # fp insertion on a half-empty seed set adds boxes into empty slots
    b, s = 2, 8
    boxes = jnp.asarray(np.tile([1.0, 1.0, -0.5, 2, 2, 2, 0.0], (b, s, 1)))
    valid = jnp.asarray(np.arange(s)[None] < 3).repeat(b, 0)
    labels = jnp.zeros((b, s), jnp.int32)
    scores = jnp.full((b, s), 0.9)
    m2 = base.clone(fp_rate=1.0)
    nb, nl, ns, nv = m2.apply(
        {"params": {}}, boxes, labels, scores, valid,
        jax.random.PRNGKey(0), method=m2._fp_insertion,
    )
    assert int(nv.sum()) == 12  # 3 originals + 3 copies per sample
    # copies are xy-shifted versions of originals
    new = np.asarray(nb)[np.asarray(nv) & ~np.asarray(valid)]
    assert (np.abs(new[:, :2] - 1.0) <= 10.0 + 1e-5).all()
    np.testing.assert_allclose(new[:, 2:], np.tile([-0.5, 2, 2, 2, 0], (6, 1)),
                               atol=1e-6)


def test_fsdpp_group_fps_crop():
    model = tiny_fsdpp().clone(n_fps=4)
    rng = np.random.RandomState(8)
    batch = make_temporal_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "seeds": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    pb, _ = model.apply(variables, batch, False, method=model.to_point_batch)
    assert np.isfinite(np.asarray(pb.points)).all()
    assert int(pb.valid.sum()) > 0


def test_residual_compaction_cap():
    """residual_points_cap gathers the surviving residual/crop points into
    a small static buffer (the TPU-native form of FSD++'s super-sparsity);
    point count is preserved under the cap and overflow is counted above
    it."""
    rng = np.random.RandomState(7)
    batch = make_temporal_batch(rng)
    base = tiny_fsdpp()
    full, _ = base.to_point_batch(batch, train=False)
    kept = int(np.asarray(full.valid).sum(axis=1).max())
    assert kept > 0

    capped_model = base.clone(residual_points_cap=1024)
    pb, overflow = capped_model.to_point_batch(batch, train=False)
    assert pb.points.shape[1] == 1024
    np.testing.assert_array_equal(
        np.asarray(pb.valid).sum(axis=1), np.asarray(full.valid).sum(axis=1))
    assert float(overflow) == 0.0
    # the same surviving points, just compacted
    for b in range(2):
        want = set(map(tuple, np.asarray(full.points[b])[
            np.asarray(full.valid[b])][:, :3].round(4).tolist()))
        got = set(map(tuple, np.asarray(pb.points[b])[
            np.asarray(pb.valid[b])][:, :3].round(4).tolist()))
        assert got == want

    tight = base.clone(residual_points_cap=8)
    pb2, overflow2 = tight.to_point_batch(batch, train=False)
    assert int(np.asarray(pb2.valid).sum(axis=1).max()) <= 8
    assert float(overflow2) > 0

"""Native C++ preprocessing vs numpy reference semantics."""

import numpy as np
import pytest

from sst_tpu.data import native
from sst_tpu.data.pipelines import GlobalRotScaleTrans, RandomFlip3D, _rot2d

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_read_bin(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(1000, 5).astype(np.float32)
    p = tmp_path / "pts.bin"
    data.tofile(p)
    out = native.read_bin(str(p))
    np.testing.assert_array_equal(out.reshape(-1, 5), data)


def test_range_filter_matches_numpy():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-100, 100, (5000, 5)).astype(np.float32)
    pcr = np.asarray([-50, -50, -2, 50, 50, 4], np.float32)
    out = native.range_filter(pts.copy(), pcr)
    m = (
        (pts[:, 0] >= pcr[0]) & (pts[:, 0] < pcr[3])
        & (pts[:, 1] >= pcr[1]) & (pts[:, 1] < pcr[4])
        & (pts[:, 2] >= pcr[2]) & (pts[:, 2] < pcr[5])
    )
    ref = pts[m]
    assert len(out) == len(ref)
    np.testing.assert_allclose(np.sort(out[:, 0]), np.sort(ref[:, 0]))


def test_rot_scale_trans_matches_pipeline():
    rng = np.random.RandomState(2)
    pts = rng.randn(500, 5).astype(np.float32) * 10
    boxes = np.concatenate(
        [rng.uniform(-20, 20, (8, 3)), rng.uniform(1, 4, (8, 3)),
         rng.uniform(-3, 3, (8, 1)), rng.randn(8, 2)], 1).astype(np.float32)
    angle, scale, trans = 0.3, 1.05, np.asarray([0.1, -0.2, 0.05], np.float32)

    class _R:
        def uniform(self, a, b=None):
            return {(-0.78539816, 0.78539816): angle}.get((a, b), angle)

    # numpy reference path (pipelines.GlobalRotScaleTrans internals)
    p_ref = pts.copy()
    b_ref = boxes.copy()
    p_ref[:, :2] = _rot2d(p_ref[:, :2], angle)
    p_ref[:, :3] = p_ref[:, :3] * scale + trans
    b_ref[:, :2] = _rot2d(b_ref[:, :2], angle)
    b_ref[:, 6] += angle
    b_ref[:, :6] *= scale
    b_ref[:, :3] += trans
    b_ref[:, 7:9] = _rot2d(boxes[:, 7:9], angle) * scale

    p_c, b_c = native.global_rot_scale_trans(pts.copy(), boxes.copy(), angle,
                                             scale, trans)
    np.testing.assert_allclose(p_c[:, :3], p_ref[:, :3], atol=1e-4)
    np.testing.assert_allclose(b_c, b_ref, atol=1e-4)


def test_flip_matches_pipeline():
    rng = np.random.RandomState(3)
    pts = rng.randn(100, 4).astype(np.float32)
    boxes = np.concatenate(
        [rng.uniform(-5, 5, (4, 6)), rng.uniform(-3, 3, (4, 1))], 1
    ).astype(np.float32)
    p_c, b_c = native.flip(pts.copy(), boxes.copy(), axis=0)
    np.testing.assert_allclose(p_c[:, 1], -pts[:, 1])
    np.testing.assert_allclose(b_c[:, 1], -boxes[:, 1])
    np.testing.assert_allclose(b_c[:, 6], -boxes[:, 6] + np.pi, atol=1e-6)
    p_v, b_v = native.flip(pts.copy(), boxes.copy(), axis=1)
    np.testing.assert_allclose(b_v[:, 6], -boxes[:, 6], atol=1e-6)


def test_flip_heading_consistency():
    """Flip yaw rule must agree with mirroring the v0.15 heading unit vector
    (sin yaw, cos yaw) — the convention box_frame_transform uses. Reference:
    lidar_box3d.flip (horizontal: yaw=-yaw+pi; vertical: yaw=-yaw)."""
    import jax.numpy as jnp

    from sst_tpu.core.boxes import flip_boxes
    from sst_tpu.ops.incremental import box_frame_transform

    rng = np.random.RandomState(11)
    boxes = np.concatenate(
        [rng.uniform(-5, 5, (16, 6)), rng.uniform(-np.pi, np.pi, (16, 1))], 1
    ).astype(np.float32)

    for axis, diag in (("x", [1.0, -1.0, 1.0]), ("y", [-1.0, 1.0, 1.0])):
        mirror = np.eye(4, dtype=np.float32)
        mirror[0, 0], mirror[1, 1], mirror[2, 2] = diag
        want = np.asarray(
            box_frame_transform(jnp.asarray(boxes), jnp.asarray(mirror),
                                jnp.eye(4, dtype=np.float32))
        )
        got = np.asarray(flip_boxes(jnp.asarray(boxes), axis=axis))
        np.testing.assert_allclose(got[:, :3], want[:, :3], atol=1e-5)
        dyaw = np.abs(np.angle(np.exp(1j * (got[:, 6] - want[:, 6]))))
        assert dyaw.max() < 1e-5, f"axis={axis} yaw mismatch {dyaw.max()}"

    # RandomFlip3D must apply the same rule
    from sst_tpu.data.pipelines import RandomFlip3D

    for ratio_h, ratio_v, axis in ((1.0, 0.0, "x"), (0.0, 1.0, "y")):
        tf = RandomFlip3D(flip_ratio_bev_horizontal=ratio_h,
                          flip_ratio_bev_vertical=ratio_v)
        sample = {
            "rng": np.random.RandomState(0),
            "points": rng.randn(10, 4).astype(np.float32),
            "gt_boxes": boxes.copy(),
        }
        out = tf(sample)["gt_boxes"]
        want = np.asarray(flip_boxes(jnp.asarray(boxes), axis=axis))
        np.testing.assert_allclose(out, want, atol=1e-5)


def test_shuffle_pad():
    rng = np.random.RandomState(4)
    pts = rng.randn(300, 5).astype(np.float32)
    out, keep = native.shuffle_pad(pts, cap=128, seed=7)
    assert keep == 128
    assert out.shape == (128, 5)
    # sampled without replacement: all rows come from the input, distinct
    rows = {tuple(np.round(r, 5)) for r in out}
    assert len(rows) == 128
    out2, keep2 = native.shuffle_pad(pts[:50], cap=128, seed=7)
    assert keep2 == 50
    assert (out2[50:] == 0).all()

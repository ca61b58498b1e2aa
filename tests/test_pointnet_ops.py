"""pointnet-family neighborhood ops (reference mmdet3d/ops/{ball_query,knn,
interpolate,gather_points,group_points})."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.pointnet import (ball_query, gather_points,
                                  grouping_operation, knn, query_and_group,
                                  three_interpolate, three_nn)


def _cloud(b=2, n=64, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-4, 4, size=(b, n, 3)).astype(np.float32))


def test_ball_query_semantics():
    # centers at origin; points on a line so in-ball membership is obvious
    xyz = jnp.array([[[0.1, 0, 0], [5.0, 0, 0], [0.2, 0, 0],
                      [0.3, 0, 0], [6.0, 0, 0]]], jnp.float32)
    ctr = jnp.array([[[0.0, 0.0, 0.0]]], jnp.float32)
    idx = ball_query(0.0, 1.0, 3, xyz, ctr)
    # first 3 in-ball points in index order: 0, 2, 3
    assert idx.shape == (1, 1, 3)
    np.testing.assert_array_equal(np.asarray(idx[0, 0]), [0, 2, 3])

    # only one in-ball point -> remaining slots repeat it
    idx2 = ball_query(0.0, 0.15, 3, xyz, ctr)
    np.testing.assert_array_equal(np.asarray(idx2[0, 0]), [0, 0, 0])

    # empty ball -> zeros (CUDA zero-init buffer semantics)
    idx3 = ball_query(0.0, 0.05, 3, xyz, ctr)
    np.testing.assert_array_equal(np.asarray(idx3[0, 0]), [0, 0, 0])

    # min_radius excludes the closest point
    idx4 = ball_query(0.15, 1.0, 2, xyz, ctr)
    np.testing.assert_array_equal(np.asarray(idx4[0, 0]), [2, 3])


def test_ball_query_respects_valid_mask():
    xyz = _cloud(1, 32)
    valid = jnp.arange(32) < 20
    ctr = xyz[:, :4]
    idx = ball_query(0.0, 3.0, 8, xyz, ctr, xyz_valid=valid[None])
    assert int(jnp.max(idx)) < 20


def test_knn_matches_bruteforce():
    xyz, ctr = _cloud(2, 48, 1), _cloud(2, 48, 2)[:, :7]
    idx = knn(4, xyz, ctr)
    assert idx.shape == (2, 4, 7)  # [B, k, npoint] transposed layout (knn.py:16)
    d = np.linalg.norm(np.asarray(ctr)[:, :, None] - np.asarray(xyz)[:, None], axis=-1)
    want = np.argsort(d, axis=-1, kind="stable")[:, :, :4]  # [B, np, k]
    got = np.swapaxes(np.asarray(idx), 1, 2)
    # compare distances, not indices (ties)
    np.testing.assert_allclose(
        np.take_along_axis(d, got, -1), np.take_along_axis(d, want, -1),
        rtol=1e-4, atol=1e-4)


def test_three_nn_and_interpolate():
    tgt, src = _cloud(1, 16, 3), _cloud(1, 8, 4)
    dist, idx = three_nn(tgt, src)
    assert dist.shape == (1, 16, 3) and idx.shape == (1, 16, 3)
    d = np.linalg.norm(np.asarray(tgt)[0][:, None] - np.asarray(src)[0][None], axis=-1)
    np.testing.assert_allclose(np.asarray(dist)[0], np.sort(d, -1)[:, :3],
                               rtol=1e-4, atol=1e-4)

    feats = jnp.asarray(np.random.RandomState(5).randn(1, 6, 8).astype(np.float32))
    w = 1.0 / jnp.maximum(dist, 1e-8)
    w = w / w.sum(-1, keepdims=True)
    out = three_interpolate(feats, idx, w)
    assert out.shape == (1, 6, 16)
    # exact-coincidence target -> exact feature recovery
    tgt2 = src[:, 2:3]
    d2, i2 = three_nn(tgt2, src)
    w2 = jnp.where(d2 < 1e-6, 1.0, 0.0)
    out2 = three_interpolate(feats, i2, w2)
    np.testing.assert_allclose(np.asarray(out2)[0, :, 0], np.asarray(feats)[0, :, 2],
                               rtol=1e-5)


def test_gather_and_grouping():
    feats = jnp.arange(2 * 3 * 5, dtype=jnp.float32).reshape(2, 3, 5)
    idx = jnp.array([[4, 0], [1, 1]], jnp.int32)
    g = gather_points(feats, idx)
    np.testing.assert_array_equal(np.asarray(g[0, 0]), [4, 0])
    np.testing.assert_array_equal(np.asarray(g[1, 1]), [21, 21])

    gidx = jnp.array([[[0, 1], [2, 2]], [[3, 4], [0, 0]]], jnp.int32)
    gg = grouping_operation(feats, gidx)
    assert gg.shape == (2, 3, 2, 2)
    np.testing.assert_array_equal(np.asarray(gg[0, 0, 0]), [0, 1])


def test_query_and_group_relative():
    xyz = _cloud(1, 32, 6)
    ctr = xyz[:, :4]
    idx = ball_query(0.0, 5.0, 8, xyz, ctr)
    g = query_and_group(xyz, ctr, idx)
    assert g.shape == (1, 3, 4, 8)
    # each center's own point appears with relative offset ~0 somewhere
    mins = jnp.min(jnp.linalg.norm(g[0], axis=0), axis=-1)
    assert float(jnp.max(mins)) < 1e-5

    feats = jnp.ones((1, 5, 32), jnp.float32)
    gf = query_and_group(xyz, ctr, idx, features=feats)
    assert gf.shape == (1, 8, 4, 8)


def test_ops_jit_and_grad():
    xyz, src = _cloud(1, 24, 7), _cloud(1, 12, 8)
    feats = jnp.ones((1, 4, 12), jnp.float32)

    def f(feats):
        d, i = three_nn(xyz, src)
        w = jax.nn.softmax(-d, axis=-1)
        return three_interpolate(feats, i, w).sum()

    g = jax.jit(jax.grad(f))(feats)
    assert g.shape == feats.shape and bool(jnp.all(jnp.isfinite(g)))


def test_knn_never_returns_invalid_indices():
    """Fewer valid points than k: tail slots repeat the nearest valid
    neighbour instead of leaking padding rows (code-review regression)."""
    xyz = _cloud(1, 16)
    xyz = xyz.at[0, 4:].set(1e3)  # padding rows pushed far away anyway
    valid = jnp.arange(16) < 4
    idx = knn(8, xyz, xyz[:, :2], xyz_valid=valid[None])
    assert int(jnp.max(idx)) < 4

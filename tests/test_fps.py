"""FPS ops (reference furthest_point_sample CUDA op + torchex group_fps)."""

import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.fps import furthest_point_sample, group_fps_mask


def np_fps(xyz, k):
    idx = [0]
    mind = np.full(len(xyz), np.inf)
    for _ in range(k - 1):
        d = np.sum((xyz - xyz[idx[-1]]) ** 2, -1)
        mind = np.minimum(mind, d)
        idx.append(int(np.argmax(mind)))
    return idx


def test_fps_matches_numpy():
    rng = np.random.RandomState(0)
    xyz = rng.randn(100, 3).astype(np.float32)
    idx, ok = furthest_point_sample(jnp.asarray(xyz), jnp.ones((100,), bool), 16)
    assert ok.all()
    assert np.asarray(idx).tolist() == np_fps(xyz, 16)


def test_fps_fewer_valid_than_k():
    xyz = np.zeros((10, 3), np.float32)
    xyz[:3] = [[0, 0, 0], [1, 0, 0], [0, 2, 0]]
    valid = np.zeros(10, bool)
    valid[:3] = True
    idx, ok = furthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 6)
    assert np.asarray(ok).sum() == 3
    assert set(np.asarray(idx)[np.asarray(ok)].tolist()) == {0, 1, 2}


def test_group_fps_mask_budget_and_spread():
    rng = np.random.RandomState(1)
    # two groups: a dense line and a cluster
    xa = np.stack([np.linspace(0, 10, 50), np.zeros(50), np.zeros(50)], -1)
    xb = rng.randn(40, 3) * 0.1 + 5
    xyz = np.concatenate([xa, xb]).astype(np.float32)
    gid = np.concatenate([np.zeros(50), np.ones(40)]).astype(np.int32)
    keep = np.asarray(group_fps_mask(
        jnp.asarray(xyz), jnp.asarray(gid), jnp.ones((90,), bool), 2, 8))
    assert keep[:50].sum() == 8 and keep[50:].sum() == 8
    # FPS on a line keeps both endpoints
    picked_x = xyz[:50][keep[:50], 0]
    assert picked_x.min() == 0.0 and picked_x.max() == 10.0


def test_group_fps_small_groups_keep_everything():
    xyz = np.random.RandomState(2).randn(20, 3).astype(np.float32)
    gid = (np.arange(20) % 5).astype(np.int32)  # 5 groups of 4 points
    valid = np.ones(20, bool)
    valid[::7] = False
    keep = np.asarray(group_fps_mask(
        jnp.asarray(xyz), jnp.asarray(gid), jnp.asarray(valid), 5, 8))
    assert (keep == valid).all()  # budget exceeds group size → all valid kept

"""Unit tests for sort/segment primitives against numpy reference math
(modeled on the reference's test_dynamic_scatter.py strategy of recomputing
per-unique-coordinate reductions in a loop)."""

import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.segment import (
    gather_segments,
    scatter_v2,
    segment_reduce,
    unique_segments,
)


def _np_unique_ref(keys, valid):
    """Reference: dense ids ordered by sorted key, ranks = order within group."""
    kv = keys[valid]
    uniq = np.unique(kv)
    seg = {k: i for i, k in enumerate(uniq)}
    return uniq, seg


def test_unique_segments_basic(rng):
    n, cap = 257, 64
    keys = rng.randint(0, 40, size=n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    res = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)
    uniq, seg = _np_unique_ref(keys, valid)
    assert int(res.num_unique) == len(uniq)
    np.testing.assert_array_equal(np.asarray(res.unique_keys[: len(uniq)]), uniq)
    seg_ids = np.asarray(res.seg_ids)
    for i in range(n):
        if valid[i]:
            assert seg_ids[i] == seg[keys[i]]
        else:
            assert seg_ids[i] == cap
    # counts
    counts = np.asarray(res.counts)
    for k, s in seg.items():
        assert counts[s] == np.sum((keys == k) & valid)
    # ranks: within each group, a permutation of 0..cnt-1
    ranks = np.asarray(res.ranks)
    for k, s in seg.items():
        r = np.sort(ranks[(keys == k) & valid])
        np.testing.assert_array_equal(r, np.arange(len(r)))


def test_unique_segments_overflow():
    keys = jnp.arange(10, dtype=jnp.int32)
    valid = jnp.ones(10, bool)
    res = unique_segments(keys, valid, 4)
    assert int(res.num_unique) == 10
    seg_ids = np.asarray(res.seg_ids)
    # first 4 distinct keys fit, rest map to >= cap (dropped downstream)
    np.testing.assert_array_equal(seg_ids[:4], np.arange(4))
    assert (seg_ids[4:] >= 4).all()


def test_segment_reduce_modes(rng):
    n, cap = 100, 16
    keys = rng.randint(0, 10, size=n).astype(np.int32)
    valid = rng.rand(n) > 0.3
    feat = rng.randn(n, 5).astype(np.float32)
    res = unique_segments(jnp.asarray(keys), jnp.asarray(valid), cap)
    seg_ids = np.asarray(res.seg_ids)
    for mode, npfn in [("sum", np.sum), ("mean", np.mean), ("max", np.max), ("min", np.min)]:
        out = np.asarray(segment_reduce(jnp.asarray(feat), jnp.asarray(seg_ids), cap, mode))
        for s in range(int(res.num_unique)):
            m = seg_ids == s
            np.testing.assert_allclose(out[s], npfn(feat[m], axis=0), rtol=1e-5, atol=1e-5)
        # empty segments are zero
        for s in range(int(res.num_unique), cap):
            np.testing.assert_array_equal(out[s], 0)


def test_scatter_v2_and_gather(rng):
    n, cap = 64, 32
    keys = rng.randint(0, 12, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    feat = rng.randn(n, 3).astype(np.float32)
    vox, uniq = scatter_v2(jnp.asarray(feat), jnp.asarray(keys), jnp.asarray(valid), cap, "mean")
    back = gather_segments(vox, uniq.seg_ids)
    back = np.asarray(back)
    for i in range(n):
        m = keys == keys[i]
        np.testing.assert_allclose(back[i], feat[m].mean(0), rtol=1e-5, atol=1e-5)


def test_empty_input():
    keys = jnp.zeros(8, jnp.int32)
    valid = jnp.zeros(8, bool)
    res = unique_segments(keys, valid, 4)
    assert int(res.num_unique) == 0
    assert (np.asarray(res.seg_ids) == 4).all()
    out = segment_reduce(jnp.ones((8, 2)), res.seg_ids, 4, "max")
    np.testing.assert_array_equal(np.asarray(out), 0)

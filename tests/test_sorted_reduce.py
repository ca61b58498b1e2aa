"""sorted_segment_reduce (Pallas one-pass reduce over voxel-sorted rows) vs
the scatter-based ops.segment.segment_reduce reference, interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.ops.segment import segment_reduce, unique_segments
from sst_tpu.ops.sorted_reduce import sorted_segment_reduce


def _mk(n, v, c, seed, frac_invalid=0.1):
    rng = np.random.RandomState(seed)
    keys = rng.randint(0, v * 3, n).astype(np.int32)
    valid = rng.rand(n) > frac_invalid
    uniq = unique_segments(jnp.asarray(keys), jnp.asarray(valid), v)
    order = jnp.argsort(jnp.where(jnp.asarray(valid), keys, 2**31 - 1),
                        stable=True)
    data = rng.randn(n, c).astype(np.float32)
    return jnp.asarray(data), uniq, order


@pytest.mark.parametrize("mode", ["sum", "max"])
@pytest.mark.parametrize("n,v,c,block", [
    (700, 300, 24, 128),    # generic ragged sizes, multi-chunk blocks
    (256, 700, 64, 128),    # more segments than rows (sparse occupancy)
    (1024, 64, 8, 256),     # big segments spanning many chunks
])
def test_matches_scatter_reference(mode, n, v, c, block):
    data, uniq, order = _mk(n, v, c, seed=n + v)
    ref = segment_reduce(data, uniq.seg_ids, v, mode)
    ds = data[order]
    ss = uniq.seg_ids[order]
    got = sorted_segment_reduce(ds, ss, v, mode, block, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_all_invalid_and_empty_segments():
    n, v, c = 128, 256, 16
    data = jnp.ones((n, c), jnp.float32)
    seg = jnp.full((n,), v, jnp.int32)  # everything dropped
    out = sorted_segment_reduce(data, seg, v, "max", 128, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    out = sorted_segment_reduce(data, seg, v, "sum", 128, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.parametrize("mode", ["sum", "max"])
def test_gradients_match_scatter_path(mode):
    n, v, c = 300, 96, 12
    data, uniq, order = _mk(n, v, c, seed=5, frac_invalid=0.2)
    ds = data[order]
    ss = uniq.seg_ids[order]

    def f_kernel(x):
        return (sorted_segment_reduce(x, ss, v, mode, 128, True) ** 2).sum()

    def f_ref(x):
        out = segment_reduce(x, ss, v, mode)
        return (out ** 2).sum()

    g_kernel = jax.grad(f_kernel)(ds)
    g_ref = jax.grad(f_ref)(ds)
    if mode == "max":
        # scatter_max ties break by row; in sorted order both pick the first
        # row of the segment — exact match expected
        np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


def test_dynamic_vfe_sorted_path_matches_scatter_path():
    # plumbing test: the sorted path (pre-gather by unique.order, reduce,
    # voxel-major output) must match the original scatter path bit-for-bit
    # up to fp reassociation, regardless of which reduce backend runs
    from sst_tpu.models.vfe import DynamicVFE
    from sst_tpu.ops.voxelize import dynamic_voxelize

    rng = np.random.RandomState(3)
    n = 512
    pts = rng.uniform(-7.5, 7.5, (n, 4)).astype(np.float32)
    bidx = jnp.zeros((n,), jnp.int32)
    valid = jnp.asarray(rng.rand(n) > 0.1)
    pcr = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
    vsz = (0.5, 0.5, 0.5)
    vm = dynamic_voxelize(jnp.asarray(pts), bidx, valid, pcr, vsz,
                          max_voxels=256, batch_size=1, need_ranks=True)
    assert vm.unique.order is not None
    kw = dict(feat_channels=(16, 16), voxel_size=vsz, point_cloud_range=pcr,
              mode="max")
    m_sorted = DynamicVFE(use_sorted_reduce=True, **kw)
    m_scatter = DynamicVFE(use_sorted_reduce=False, **kw)
    variables = m_scatter.init(jax.random.PRNGKey(0), jnp.asarray(pts), vm)
    out_scatter = m_scatter.apply(variables, jnp.asarray(pts), vm)
    out_sorted = m_sorted.apply(variables, jnp.asarray(pts), vm)
    np.testing.assert_allclose(np.asarray(out_sorted),
                               np.asarray(out_scatter), rtol=1e-5, atol=1e-5)

    # gradients: compare through the tie-free mean mode (max-mode grads at
    # relu-zero TIES legitimately differ by which tied row wins under a row
    # permutation — same indeterminacy as torch_scatter's atomics; the
    # kernel-vs-scatter max grad in identical order is tested exactly above)
    kw_mean = dict(kw, mode="mean")
    m_sorted = DynamicVFE(use_sorted_reduce=True, **kw_mean)
    m_scatter = DynamicVFE(use_sorted_reduce=False, **kw_mean)

    def loss(params, mod):
        o = mod.apply({"params": params, **{k: v for k, v in variables.items()
                                            if k != "params"}},
                      jnp.asarray(pts), vm, train=False)
        return (o ** 2).sum()

    g1 = jax.grad(loss)(variables["params"], m_sorted)
    g2 = jax.grad(loss)(variables["params"], m_scatter)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

"""PointPillarsScatter + SECOND-style SparseEncoder (reference
mmdet3d/models/middle_encoders/)."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.models.middle_encoders import (PointPillarsScatter, SparseEncoder,
                                            zdown_grid_and_table)
from sst_tpu.ops.sparse_conv import build_canvas, gather_gemm, make_sparse_grid


def test_pillar_scatter_golden():
    feats = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], jnp.float32)
    coors = jnp.array([[0, 0, 1, 2], [0, 0, 0, 0], [1, 0, 3, 1]], jnp.int32)
    valid = jnp.array([True, True, True])
    mod = PointPillarsScatter(in_channels=2, output_shape=(4, 4), batch_size=2)
    out = mod.apply({}, feats, coors, valid)
    assert out.shape == (2, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(out[0, 1, 2]), [1, 2])
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [3, 4])
    np.testing.assert_array_equal(np.asarray(out[1, 3, 1]), [5, 6])
    assert float(jnp.abs(out).sum()) == 21.0  # nothing else written

    # padding rows must not write
    out2 = mod.apply({}, feats, coors, jnp.array([True, False, True]))
    assert float(jnp.abs(out2[0, 0, 0]).sum()) == 0.0


def _random_grid(nz=10, ny=16, nx=16, v=80, b=2, cap=128, seed=0):
    rng = np.random.RandomState(seed)
    picks = rng.choice(b * nz * ny * nx, size=v, replace=False)
    bb = picks // (nz * ny * nx)
    r = picks % (nz * ny * nx)
    z, r = r // (ny * nx), r % (ny * nx)
    y, x = r // nx, r % nx
    coords = np.zeros((cap, 4), np.int32)
    coords[:v] = np.stack([bb, z, y, x], -1)
    valid = np.arange(cap) < v
    sg, order = make_sparse_grid(
        jnp.asarray(coords), jnp.asarray(valid), (nz, ny, nx), b)
    return sg


def test_zdown_table_matches_dense_conv():
    sg = _random_grid()
    canvas = build_canvas(sg)
    out_sg, nbr = zdown_grid_and_table(sg, canvas, sg.cap)
    nz, ny, nx = sg.grid
    oz = (nz - 3) // 2 + 1
    assert out_sg.grid == (oz, ny, nx)

    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(sg.cap, 4).astype(np.float32))
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(3, 4, 5).astype(np.float32))
    sparse_out = gather_gemm(feats, nbr, w)

    # dense reference: scatter, then valid-conv along z with stride 2
    dense = np.zeros((sg.batch_size, nz, ny, nx, 4), np.float32)
    c = np.asarray(sg.coords)
    fv = np.asarray(feats)
    for i in range(sg.cap):
        if bool(sg.valid[i]):
            dense[c[i, 0], c[i, 1], c[i, 2], c[i, 3]] = fv[i]
    wn = np.asarray(w)
    oc = np.asarray(out_sg.coords)
    for i in range(out_sg.cap):
        if not bool(out_sg.valid[i]):
            continue
        b_, o, y, x = oc[i]
        want = sum(dense[b_, o * 2 + k, y, x] @ wn[k] for k in range(3))
        np.testing.assert_allclose(np.asarray(sparse_out[i]), want,
                                   rtol=1e-4, atol=1e-4)


def test_sparse_encoder_end_to_end():
    sg = _random_grid(nz=12, ny=24, nx=24, v=150, b=2, cap=256)
    feats = jnp.asarray(
        np.random.RandomState(3).randn(256, 5).astype(np.float32))
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    enc = SparseEncoder(in_channels=5, base_channels=8, output_channels=16,
                        encoder_channels=((8,), (16, 16), (32, 32)),
                        encoder_paddings=((1,), (1, 1), (1, 1)),
                        level_cap_ratios=(1.0, 1.0, 1.0))
    vars_ = enc.init(jax.random.PRNGKey(0), feats, sg, train=False)
    out = enc.apply(vars_, feats, sg, train=False)
    # 2 downsamples: 24 -> 12 -> 6 BEV; z 12 -> 6 -> 3 -> zdown (3-3)//2+1 = 1
    assert out.shape == (2, 6, 6, 16 * 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # jit + grad
    def loss(v):
        return (enc.apply(v, feats, sg, train=False) ** 2).mean()
    g = jax.jit(jax.grad(loss))(vars_)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g["params"]))

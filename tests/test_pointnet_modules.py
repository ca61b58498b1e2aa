"""PointNet++ SA/FP modules and PAConv (reference
mmdet3d/ops/pointnet_modules/, ops/paconv/)."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.models.pointnet_modules import (PAConv, PointFPModule,
                                             PointSAModule, PointSAModuleMSG)


def _cloud(b=2, n=128, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-3, 3, size=(b, n, 3)).astype(np.float32))


def test_sa_module_msg_shapes_and_grad():
    xyz = _cloud()
    feats = jnp.asarray(np.random.RandomState(1).randn(2, 6, 128).astype(np.float32))
    mod = PointSAModuleMSG(
        num_point=32, radii=(0.8, 1.6), sample_nums=(8, 16),
        mlp_channels=((9, 16), (9, 32)))  # 6 feat + 3 xyz
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, new_feats, idx = mod.apply(vars_, xyz, feats)
    assert new_xyz.shape == (2, 32, 3)
    assert new_feats.shape == (2, 16 + 32, 32)
    assert idx.shape == (2, 32)

    def loss(v):
        _, f, _ = mod.apply(v, xyz, feats)
        return (f ** 2).mean()

    g = jax.grad(lambda v: loss(v))(vars_)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_sa_module_respects_valid_mask():
    xyz = _cloud(1, 64, 2)
    # put padding rows far away; they must never be sampled or grouped
    xyz = xyz.at[0, 48:].set(500.0)
    valid = (jnp.arange(64) < 48)[None]
    mod = PointSAModule(num_point=16, radii=(1.0,), sample_nums=(8,),
                        mlp_channels=((3, 8),))
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, None, valid)
    new_xyz, _, idx = mod.apply(vars_, xyz, None, valid)
    assert int(jnp.max(idx)) < 48
    assert float(jnp.max(jnp.abs(new_xyz))) < 10.0


def test_fp_module_interpolates():
    tgt, src = _cloud(1, 40, 3), _cloud(1, 10, 4)
    sf = jnp.asarray(np.random.RandomState(5).randn(1, 4, 10).astype(np.float32))
    tf = jnp.asarray(np.random.RandomState(6).randn(1, 2, 40).astype(np.float32))
    mod = PointFPModule(mlp_channels=(6, 8))
    vars_ = mod.init(jax.random.PRNGKey(0), tgt, src, tf, sf)
    out = mod.apply(vars_, tgt, src, tf, sf)
    assert out.shape == (1, 8, 40)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_paconv_forward_and_chain():
    feats = jnp.asarray(np.random.RandomState(7).randn(2, 8, 16, 4).astype(np.float32))
    gxyz = jnp.asarray(np.random.RandomState(8).randn(2, 3, 16, 4).astype(np.float32))
    conv = PAConv(in_channels=8, out_channels=12, num_kernels=4)
    vars_ = conv.init(jax.random.PRNGKey(0), (feats, gxyz))
    out, xyz_out = conv.apply(vars_, (feats, gxyz))
    assert out.shape == (2, 12, 16, 4)
    np.testing.assert_array_equal(np.asarray(xyz_out), np.asarray(gxyz))
    # weight bank shape matches reference [in_c * kernel_mul, m * out_c]
    assert vars_["params"]["weight_bank"].shape == (16, 48)
    # scores softmax over kernels: outputs finite under jit
    out_j, _ = jax.jit(lambda v, i: conv.apply(v, i))(vars_, (feats, gxyz))
    assert bool(jnp.all(jnp.isfinite(out_j)))

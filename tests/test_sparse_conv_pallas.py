"""Windowed Pallas sparse conv vs the XLA neighbor-table path.

The XLA path (ops/sparse_conv.py) is itself validated against dense conv in
test_sparse_conv.py, so equality here transitively pins the Pallas kernel to
spconv semantics (reference mmdet3d/ops/spconv/ops.py:46,109)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.ops.sparse_conv import downsample_grid, make_sparse_grid
from sst_tpu.ops import sparse_conv_pallas as scp


@pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    monkeypatch.setenv("SST_TPU_PALLAS_INTERPRET", "1")


def _grid(rng, cap=320, batch=2, grid=(8, 24, 24), fill=260):
    nz, ny, nx = grid
    coords = np.stack([
        rng.randint(0, batch, fill),
        rng.randint(0, nz, fill),
        rng.randint(0, ny, fill),
        rng.randint(0, nx, fill),
    ], 1).astype(np.int32)
    coords = np.unique(coords, axis=0)  # duplicates would alias sites
    n = coords.shape[0]
    coords = np.concatenate(
        [coords, -np.ones((cap - n, 4), np.int32)])
    valid = np.arange(cap) < n
    sg, order = make_sparse_grid(jnp.asarray(coords), jnp.asarray(valid),
                                 grid, batch)
    return sg


def _plans(sg, mode, out_sg=None, in_sg=None, stride=(2, 2, 2),
           padding=(1, 1, 1)):
    out_sg = out_sg if out_sg is not None else sg
    in_sg = in_sg if in_sg is not None else sg
    ref = scp.build_conv_plans(out_sg, in_sg, mode, stride, padding,
                               use_windows=False)
    fast = scp.build_conv_plans(out_sg, in_sg, mode, stride, padding,
                                use_windows=True)
    return ref, fast


def _run_both(feats, w, ref, fast):
    out_ref = scp.windowed_sparse_conv(feats, w, ref)
    out_fast = scp.windowed_sparse_conv(feats, w, fast)
    return np.asarray(out_ref), np.asarray(out_fast)


@pytest.mark.parametrize("cin,cout", [(64, 64), (64, 128)])
def test_subm_forward_matches_nbr_path(rng, cin, cout):
    sg = _grid(rng)
    bwd = scp.build_window_plan(sg, sg, "subm")
    ref, fast = _plans(sg, "subm")
    feats = jnp.asarray(rng.randn(sg.cap, cin), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, cin, cout) * 0.1, jnp.float32)
    a, b = _run_both(feats, w, ref, fast)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.abs(a).sum() > 0


def test_strided_and_inverse_match_nbr_path(rng):
    sg = _grid(rng)
    down = downsample_grid(sg, 192)
    ref_s, fast_s = _plans(sg, "strided", out_sg=down, in_sg=sg)
    ref_i, fast_i = _plans(sg, "inverse", out_sg=sg, in_sg=down)
    # wire the transpose plans the way build_unet_plan does
    fast_s = fast_s.replace(bwd=fast_i.fwd)
    fast_i = fast_i.replace(bwd=fast_s.fwd)
    feats = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, 64, 64) * 0.1, jnp.float32)
    a, b = _run_both(feats, w, ref_s, fast_s)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.abs(a).sum() > 0
    dfeats = jnp.asarray(rng.randn(down.cap, 64), jnp.float32)
    dfeats = jnp.where(down.valid[:, None], dfeats, 0.0)
    a, b = _run_both(dfeats, w, ref_i, fast_i)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    assert np.abs(a).sum() > 0


def test_subm_gradients_match_nbr_path(rng):
    sg = _grid(rng, cap=256, fill=200)
    ref, fast = _plans(sg, "subm")
    feats = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, 64, 64) * 0.1, jnp.float32)
    gsel = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)

    def loss(f, ww, plan):
        out = scp.windowed_sparse_conv(f, ww, plan)
        return (out * gsel).sum()

    gf_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(feats, w, ref)
    gf_fast, gw_fast = jax.grad(loss, argnums=(0, 1))(feats, w, fast)
    np.testing.assert_allclose(np.asarray(gf_ref), np.asarray(gf_fast),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_ref), np.asarray(gw_fast),
                               rtol=1e-4, atol=1e-4)


def test_strided_gradients_match_nbr_path(rng):
    sg = _grid(rng, cap=256, fill=200)
    down = downsample_grid(sg, 128)
    ref_s, fast_s = _plans(sg, "strided", out_sg=down, in_sg=sg)
    _, fast_i = _plans(sg, "inverse", out_sg=sg, in_sg=down)
    fast_s = fast_s.replace(bwd=fast_i.fwd)
    feats = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, 64, 64) * 0.1, jnp.float32)
    gsel = jnp.asarray(rng.randn(down.cap, 64), jnp.float32)

    def loss(f, ww, plan):
        return (scp.windowed_sparse_conv(f, ww, plan) * gsel).sum()

    gf_ref, gw_ref = jax.grad(loss, argnums=(0, 1))(feats, w, ref_s)
    gf_fast, gw_fast = jax.grad(loss, argnums=(0, 1))(feats, w, fast_s)
    np.testing.assert_allclose(np.asarray(gf_ref), np.asarray(gf_fast),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_ref), np.asarray(gw_fast),
                               rtol=1e-4, atol=1e-4)


def test_ineligible_channels_take_late_nbr_path(rng, monkeypatch):
    # force the VMEM gate shut so the plan_nbr fallback runs
    monkeypatch.setattr(scp, "_WEIGHT_VMEM_LIMIT", 1)
    sg = _grid(rng, cap=256, fill=200)
    ref, fast = _plans(sg, "subm")
    feats = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, 64, 64) * 0.1, jnp.float32)
    a, b = _run_both(feats, w, ref, fast)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_bf16_path_close_to_f32(rng):
    sg = _grid(rng, cap=256, fill=200)
    ref, fast = _plans(sg, "subm")
    feats = jnp.asarray(rng.randn(sg.cap, 64), jnp.float32)
    feats = jnp.where(sg.valid[:, None], feats, 0.0)
    w = jnp.asarray(rng.randn(27, 64, 64) * 0.1, jnp.float32)
    a = scp.windowed_sparse_conv(feats, w, ref)
    b = scp.windowed_sparse_conv(feats.astype(jnp.bfloat16),
                                 w.astype(jnp.bfloat16), fast)
    assert b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                               rtol=0.1, atol=0.15)

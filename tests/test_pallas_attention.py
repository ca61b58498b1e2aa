"""Pallas fused window-MHA vs the einsum reference (interpret mode on CPU;
the same kernel runs compiled on TPU — see sst.WindowAttention)."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.pallas_attention import _attn_pieces, _window_mha_fwd_impl


def test_window_mha_matches_einsum_interpret():
    rng = np.random.RandomState(0)
    W, T, C, H = 16, 32, 128, 8
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    pad = jnp.asarray(rng.rand(W, T) > 0.8)
    out = np.asarray(
        _window_mha_fwd_impl(q, k, v, pad.astype(jnp.float32), H,
                             block_windows=8, interpret=True),
        np.float32,
    )
    ref, _, _ = _attn_pieces(q, k, v, pad.astype(jnp.float32), H)
    ref = np.asarray(ref, np.float32)
    valid = ~np.asarray(pad)
    err = np.abs(out - ref)[valid]
    assert err.max() < 0.05, err.max()


def test_window_mha_odd_tokens_interpret():
    """T=30 (not a multiple of 8) must work via equal-to-dim block shape."""
    rng = np.random.RandomState(1)
    W, T, C, H = 8, 30, 64, 4
    q = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(W, T, C).astype(np.float32))
    pad = jnp.zeros((W, T), bool)
    out = np.asarray(
        _window_mha_fwd_impl(q, k, v, pad.astype(jnp.float32), H,
                             interpret=True), np.float32)
    ref, _, _ = _attn_pieces(q, k, v, pad.astype(jnp.float32), H)
    assert np.abs(out - np.asarray(ref, np.float32)).max() < 0.05

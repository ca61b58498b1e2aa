"""Fused windowed multi-head attention (Pallas TPU kernel).

The SST backbone's hot loop is MHA over many small windows
([num_windows, max_tokens, 128] with max_tokens in {30..144}). In plain XLA
the per-head logits tensor [W, H, T, T] (up to 59M elements per bucket per
layer) round-trips HBM three times (QK^T write, softmax, AV read) — measured
as the dominant bandwidth cost. This kernel keeps the whole
logits→softmax→AV chain in VMEM per window block: HBM traffic drops to one
read of q/k/v and one write of the output.

Numerics match sst.WindowAttention's bf16 path (bf16 matmuls, f32 softmax
accumulation is unnecessary at T<=160; the additive -1e4 pad mask matches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, pad_ref, out_ref, *, nhead: int):
    """One block of BW windows: q/k/v [BW, T, C] bf16, pad [BW, T] (1=pad)."""
    bw, t, c = q_ref.shape
    dh = c // nhead
    scale = 1.0 / (dh ** 0.5)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    neg = pad_ref[:] * -1e4  # [BW, T] (pad mask pre-cast to f32 0/1)

    # static python loop over heads; each head is a lane-slice of C (Mosaic
    # cannot reshape the minor dim, but static lane slices are fine). The
    # per-head outputs are accumulated and written ONCE as a full-lane store —
    # eight 16-lane strided stores were measured ~20% slower end to end.
    acc = []
    for h in range(nhead):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, :, sl]
        kh = k[:, :, sl]
        vh = v[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [BW, T, T]
        logits = logits + neg[:, None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # normalize on the [BW, T, dh] output instead of the [BW, T, T]
        # probs — one fewer full pass over the logits-sized tensor
        s = jnp.sum(p, axis=-1, keepdims=True)  # [BW, T, 1]
        oh = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [BW, T, dh]
        acc.append((oh / s).astype(out_ref.dtype))
    out_ref[:] = jnp.concatenate(acc, axis=-1)


def _window_mha_fwd_impl(q, k, v, pad_mask, nhead: int, block_windows: int = 0,
                         interpret: bool = False):
    """q/k/v: [W, T, C]; pad_mask: [W, T] bool (True = padding slot).

    Returns [W, T, C] attention output, padding rows undefined (masked by the
    caller's window2flat gather)."""
    w, t, c = q.shape
    if block_windows <= 0:
        # target ~4MB of logits scratch per block (BW*H*T*T*4B); BW must be a
        # multiple of 8 (pad-mask block sublane constraint) that divides W.
        budget = max(8, ((1 << 22) // max(nhead * t * t * 4, 1)) // 8 * 8)
        block_windows = min(w, budget)
        while block_windows > 8 and (w % block_windows or block_windows % 8):
            block_windows -= 8
        if w % block_windows:
            block_windows = w  # equal-to-dim always satisfies the constraint
    grid = (w // block_windows,)
    bspec = lambda: pl.BlockSpec(  # noqa: E731
        (block_windows, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    pspec = pl.BlockSpec((block_windows, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, nhead=nhead),
        grid=grid,
        in_specs=[bspec(), bspec(), bspec(), pspec],
        out_specs=bspec(),
        out_shape=jax.ShapeDtypeStruct((w, t, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * w * nhead * t * t * (c // nhead),
            bytes_accessed=4 * w * t * c * 2,
            transcendentals=w * nhead * t * t,
        ),
        interpret=interpret,
    )(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
      pad_mask.astype(jnp.float32))


def _attn_pieces(q, k, v, pad_mask, nhead):
    """Reference einsum attention returning (out, probs) for the backward."""
    w, t, c = q.shape
    dh = c // nhead
    q4 = q.reshape(w, t, nhead, dh).astype(jnp.bfloat16)
    k4 = k.reshape(w, t, nhead, dh).astype(jnp.bfloat16)
    v4 = v.reshape(w, t, nhead, dh).astype(jnp.bfloat16)
    logits = jnp.einsum("wthd,wshd->whts", q4, k4,
                        preferred_element_type=jnp.float32) / (dh ** 0.5)
    logits = logits + jnp.where(pad_mask[:, None, None, :] > 0, -1e4, 0.0)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("whts,wshd->wthd", p.astype(jnp.bfloat16), v4)
    return out.reshape(w, t, c), p, (q4, k4, v4)


def _env_interpret() -> bool:
    import os

    return bool(os.environ.get("SST_TPU_PALLAS_INTERPRET"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _window_mha_vjp(q, k, v, pad_mask, nhead: int):
    return _window_mha_fwd_impl(q, k, v, pad_mask, nhead,
                                interpret=_env_interpret())


def window_mha(q, k, v, pad_mask, nhead: int):
    """Fused windowed MHA; differentiable (einsum-recompute backward).
    pad_mask may be bool or float (nonzero = padding slot)."""
    return _window_mha_vjp(q, k, v, pad_mask.astype(jnp.float32), nhead)


def _mha_fwd(q, k, v, pad_mask, nhead):
    out = _window_mha_fwd_impl(q, k, v, pad_mask, nhead,
                               interpret=_env_interpret())
    return out, (q, k, v, pad_mask)


def _mha_bwd(nhead, res, g):
    q, k, v, pad_mask = res
    w, t, c = q.shape
    dh = c // nhead
    _, p, (q4, k4, v4) = _attn_pieces(q, k, v, pad_mask, nhead)
    g4 = g.reshape(w, t, nhead, dh).astype(jnp.float32)
    pf = p
    dv = jnp.einsum("whts,wthd->wshd", pf, g4)
    dp = jnp.einsum("wthd,wshd->whts", g4, v4.astype(jnp.float32))
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    ds = ds / (dh ** 0.5)
    dq = jnp.einsum("whts,wshd->wthd", ds, k4.astype(jnp.float32))
    dk = jnp.einsum("whts,wthd->wshd", ds, q4.astype(jnp.float32))
    shape = (w, t, c)
    return (dq.reshape(shape).astype(q.dtype),
            dk.reshape(shape).astype(k.dtype),
            dv.reshape(shape).astype(v.dtype),
            jnp.zeros_like(pad_mask))


_window_mha_vjp.defvjp(_mha_fwd, _mha_bwd)

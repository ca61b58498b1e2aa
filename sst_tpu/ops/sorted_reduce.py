"""One-pass Pallas segment reduction over voxel-sorted rows.

The dynamic-VFE encoders (reference voxel_encoder.py:93 DynamicVFE /
:503 DynamicScatterVFE) spend their time in per-pass scatter reductions
(torch_scatter ``scatter_max``/``scatter_mean``).  On TPU an XLA scatter at
~200k rows is index-latency-bound (~3-5 ms per pass, nearly independent of
row width — measured, see README).  But the sort-path voxelizer
(ops/segment.py ``unique_segments``) has *already* grouped rows by voxel in
its sort: exposing that permutation lets every subsequent reduction run as a
single streaming pass over rows in segment order — no scatter at all.

Kernel shape (``_sorted_reduce_kernel``):
  * grid = output voxel-row blocks of ``block`` rows; block ``j`` owns output
    rows [j*B, (j+1)*B) and consumes exactly the input rows whose (sorted,
    dense, nondecreasing) segment id falls in that range — located with one
    host-side ``searchsorted`` over the chunk boundaries.
  * there is a SINGLE tile-aligned DMA stream: the host packs rows into an
    [N_pad, C_pad] f32 array whose lane ``c`` carries the row's segment id
    (exact in f32 for ids < 2**24) and whose lane count is a multiple of 128,
    so every HBM slice obeys the (8, 128) Mosaic tiling.  Chunks are streamed
    through VMEM with double-buffered DMA; rows of neighbouring blocks that
    share a chunk are masked for free by the local-id one-hot.
  * the id column [B, 1] is recovered in-kernel by a masked lane-max over the
    id lane's 128-lane group; the one-hot is built as ``M[r, l] = lid[r]==l``
    and contracted over ``r`` (an lhs-transposed matmul) so the kernel never
    needs a vector transpose.
  * mode='sum': the per-chunk reduction IS a matmul — M^T @ chunk on the MXU.
  * mode='max': an in-chunk segmented Hillis-Steele scan (log2(B) vector
    steps — rows of one segment are contiguous, so "same segment within
    distance d" is exact), then a run-last one-hot matmul picks each
    segment's chunk-total; chunk totals combine into the block accumulator
    with a masked max.  Empty segments finalize to 0, matching
    torch_scatter's zero-init convention (ops/segment.py segment_reduce).

The public entry :func:`sorted_segment_reduce` pads rows/segments to block
multiples, remaps invalid ids past the padded range, and provides a
custom_vjp whose backward is the standard gather (sum) / argmax-gather (max)
so training keeps XLA's fused backward. Falls back to ops.segment.segment_reduce
off-TPU (CPU mesh tests, multichip dryrun) unless ``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sst_tpu.ops.segment import segment_reduce

_NEG = -3.0e38  # finite stand-in for -inf (avoids inf arithmetic in VMEM)


def _seg_scan_max(vals, idcol, block: int):
    """Inclusive segmented max scan down rows of ``vals`` [B, C]; rows with
    equal ``idcol`` [B, 1] form contiguous runs (sorted input)."""
    d = 1
    row = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    while d < block:
        shifted = jnp.concatenate(
            [jnp.full((d,) + vals.shape[1:], _NEG, vals.dtype), vals[:-d]], 0)
        id_shift = jnp.concatenate(
            [jnp.full((d, 1), -2.0, idcol.dtype), idcol[:-d]], 0)
        same = (idcol == id_shift) & (row >= d)
        vals = jnp.where(same, jnp.maximum(vals, shifted), vals)
        d *= 2
    return vals


def _sorted_reduce_kernel(t0s, t1s, data_hbm, out_ref, dbuf, sems, *,
                          block: int, mode: str, id_lane: int):
    j = pl.program_id(0)
    t0 = t0s[j]
    t1 = t1s[j]
    seg_base = j * block
    out_ref[:] = jnp.full_like(out_ref, 0.0 if mode == "sum" else _NEG)
    c_pad = out_ref.shape[1]

    def dma(slot, t):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(t * block, block), :], dbuf.at[slot],
            sems.at[slot])

    @pl.when(t0 < t1)
    def _():
        dma(t0 % 2, t0).start()

    def body(t, carry):
        slot = t % 2

        @pl.when(t + 1 < t1)
        def _():
            dma((t + 1) % 2, t + 1).start()

        dma(slot, t).wait()
        chunk = dbuf[slot]                     # [B, C_pad] (lane id_lane = seg id)
        # id column [B, 1]: masked lane-max over the id lane's 128-lane group
        # (ids are >= 0; other lanes masked to -1).
        g0 = (id_lane // 128) * 128
        grp = chunk[:, g0:g0 + 128]
        lmask = jax.lax.broadcasted_iota(
            jnp.int32, (block, 128), 1) == (id_lane - g0)
        idcol = jnp.max(jnp.where(lmask, grp, -1.0), axis=1, keepdims=True)
        lid = idcol.astype(jnp.int32) - seg_base          # [B, 1]
        liota = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        m = lid == liota                                  # [B(r), B(l)]
        contract_r = (((0,), (0,)), ((), ()))
        # HIGHEST: the MXU's default bf16 passes round the f32 payload rows
        # (~4e-3 rel error); the one-hot contraction must be exact-f32.
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=contract_r,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        if mode == "sum":
            out_ref[:] += dot(m.astype(chunk.dtype), chunk)
        else:
            scanned = _seg_scan_max(chunk, idcol, block)
            nxt = jnp.concatenate(
                [idcol[1:], jnp.full((1, 1), -2.0, idcol.dtype)], 0)
            sel = (m & (idcol != nxt)).astype(chunk.dtype)  # [r, l]
            partial = dot(sel, scanned)
            present = dot(sel, jnp.ones((block, 1), chunk.dtype)) > 0  # [l,1]
            out_ref[:] = jnp.maximum(
                out_ref[:], jnp.where(present, partial, _NEG))
        return carry

    jax.lax.fori_loop(t0, t1, body, 0)
    if mode != "sum":
        out_ref[:] = jnp.where(out_ref[:] > _NEG / 2, out_ref[:], 0.0)


@functools.partial(
    jax.jit, static_argnames=("num_segments", "mode", "block", "interpret"))
def _sorted_reduce_fwd_impl(data, seg, num_segments: int, mode: str,
                            block: int, interpret: bool):
    n, c = data.shape
    b = block
    v_pad = -(-num_segments // b) * b
    n_pad = -(-n // b) * b
    c_pad = -(-(c + 1) // 128) * 128  # data lanes [0,c), id lane c, zeros after
    # invalid / overflow rows (seg outside [0, num_segments)) and row padding
    # must land outside every output block: remap past the padded seg range.
    segk = jnp.where(
        (seg < 0) | (seg >= num_segments), v_pad, seg).astype(jnp.int32)
    segk = jnp.concatenate(
        [segk, jnp.full((n_pad - n,), v_pad, jnp.int32)])
    datap = jnp.pad(data.astype(jnp.float32),
                    ((0, n_pad - n), (0, c_pad - c)))
    datap = datap.at[:, c].set(segk.astype(jnp.float32))
    bounds = jnp.searchsorted(
        segk, jnp.arange(0, v_pad + 1, b, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    t0s = bounds[:-1] // b
    t1s = (bounds[1:] + b - 1) // b
    grid = v_pad // b

    out = pl.pallas_call(
        functools.partial(_sorted_reduce_kernel, block=b, mode=mode,
                          id_lane=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (b, c_pad), lambda j, t0s, t1s: (j, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, b, c_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((v_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(t0s, t1s, datap)
    return out[:num_segments, :c].astype(data.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sorted_segment_reduce(data, seg, num_segments: int, mode: str = "sum",
                          block: int = 512, interpret: bool = False):
    """Segment reduce over rows PRE-SORTED by dense segment id.

    Args:
      data: [N, C] rows grouped by segment (the voxel sort's order).
      seg: [N] int32 nondecreasing dense ids; outside [0, num_segments) =
        dropped.
      num_segments: static output rows.
      mode: 'sum' | 'max'.
    Returns [num_segments, C]; empty segments are 0 (torch_scatter zero-init
    convention, like ops.segment.segment_reduce).
    """
    if not interpret and jax.default_backend() != "tpu":
        import os

        if os.environ.get("SST_TPU_PALLAS_INTERPRET"):
            interpret = True  # CPU-mesh tests exercise the kernel path
        else:
            return segment_reduce(data, seg, num_segments, mode)
    if num_segments >= (1 << 24) - block:  # ids must stay exact in f32 lanes
        return segment_reduce(data, seg, num_segments, mode)
    return _sorted_reduce_fwd_impl(data, seg, num_segments, mode, block,
                                   interpret)


def _fwd(data, seg, num_segments, mode, block, interpret):
    out = sorted_segment_reduce(data, seg, num_segments, mode, block,
                                interpret)
    res = (data, seg) if mode != "sum" else (seg,)
    return out, res + ((out,) if mode != "sum" else ())


def _bwd(num_segments, mode, block, interpret, res, g):
    if mode == "sum":
        (seg,) = res
        keep = ((seg >= 0) & (seg < num_segments))[:, None]
        safe = jnp.clip(seg, 0, num_segments - 1)
        gd = jnp.where(keep, g[safe], 0.0)
        return gd.astype(g.dtype), None
    data, seg, out = res
    n = data.shape[0]
    keep = (seg >= 0) & (seg < num_segments)
    safe = jnp.clip(seg, 0, num_segments - 1)
    is_max = (data == out[safe]) & keep[:, None]
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], data.shape)
    rows = jnp.where(is_max, rows, n)
    argmax = jax.ops.segment_min(rows, safe, num_segments=num_segments)
    gd = jnp.where(rows == argmax[safe], g[safe], 0.0)
    return gd.astype(data.dtype), None


sorted_segment_reduce.defvjp(_fwd, _bwd)

"""Device-side connected-component labeling + static compaction helpers.

TPU replacement for the reference's clustering backends (SURVEY §2.2):
scipy CCL on CPU at train time (`find_connected_componets`,
single_stage_fsd.py:44-66) and torchex GPU CCL at test time. Here: dense
thresholded xy-distance adjacency over ≤ a few thousand cluster centers +
iterative min-label propagation (converges in graph-diameter steps, run to
fixpoint with a bounded while_loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sst_tpu.ops.segment import unique_segments


@functools.partial(jax.jit, static_argnames=("max_iters",))
def connected_components(xy, batch_idx, valid, dist_thr: float, max_iters: int = 64):
    """Label CC of the graph {(i,j): |xy_i - xy_j| < dist_thr, same batch}.

    Args:
      xy: [M, 2] float coords (cluster centers).
      batch_idx: [M] int32 — edges never cross samples.
      valid: [M] bool.

    Returns [M] int32 labels in [0, M), where connected nodes share the
    minimum node index of their component; invalid rows get M.
    """
    m = xy.shape[0]
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
    adj = (
        (d2 < dist_thr**2)
        & (batch_idx[:, None] == batch_idx[None, :])
        & valid[:, None]
        & valid[None, :]
    )
    init = jnp.where(valid, jnp.arange(m, dtype=jnp.int32), m)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        neigh = jnp.where(adj, labels[None, :], m)
        new = jnp.minimum(labels, neigh.min(axis=1))
        return new, (new != labels).any(), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.asarray(True), 0))
    return labels


def compact_labels(labels, valid, num_segments: int):
    """Root labels → dense 0..K-1 ids (make_continuous_inds analog)."""
    uniq = unique_segments(labels, valid, num_segments)
    return uniq.seg_ids, uniq.num_unique


@functools.partial(jax.jit, static_argnames=("k",))
def topk_compact(scores, mask, k: int):
    """Select up to k rows by score among mask; returns (indices [k],
    valid [k]). The static-shape replacement for boolean-mask compaction
    (fg sampling, single_stage_fsd.py:698-748)."""
    s = jnp.where(mask, scores, -jnp.inf)
    top, idx = jax.lax.top_k(s, k)
    return idx, jnp.isfinite(top)

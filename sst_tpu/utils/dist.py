"""Data-parallel axis context for shard_map training.

The reference trains DDP-style: per-rank loss, gradient all-reduce, and
NaiveSyncBN all-reduce of batch-norm statistics (mmdet3d/ops/norm.py:29,
apis/seq_training_apis.py:146-151).  The TPU rebuild offers two equivalent
wirings:

  * pjit/GSPMD (train/step.py make_jitted_train_step): batch sharded over the
    mesh, XLA inserts the collectives.  Opaque custom kernels (pallas_call)
    cannot be auto-partitioned, so this path falls back to the einsum/scatter
    implementations of the two hot kernels.
  * shard_map (train/step.py make_shard_map_train_step): the WHOLE step runs
    per-shard with explicit ``lax.pmean`` of grads — exactly DDP semantics —
    and every Pallas kernel sees a single-device view, so the fused window-MHA
    and sorted segment-reduce stay on their fast paths on multi-chip meshes.

Inside shard_map the model must know the bound axis name so MaskedBatchNorm
can psum its statistics (NaiveSyncBN parity) and the Pallas gates can stay
on.  Threading an axis_name attribute through every module would touch all
model configs, so the axis rides a context variable instead: the shard_map
step body enters :func:`data_axis_ctx`, and modules query :func:`data_axis`.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar

import jax

_DATA_AXIS: ContextVar[str | None] = ContextVar("sst_tpu_data_axis",
                                                default=None)


def data_axis() -> str | None:
    """Mesh axis name bound by the shard_map train step, or None."""
    return _DATA_AXIS.get()


@contextlib.contextmanager
def data_axis_ctx(name: str | None):
    tok = _DATA_AXIS.set(name)
    try:
        yield
    finally:
        _DATA_AXIS.reset(tok)


def psum_if_dist(x):
    """lax.psum over the bound data axis, identity outside shard_map."""
    ax = data_axis()
    return jax.lax.psum(x, ax) if ax is not None else x


def pmean_if_dist(x):
    ax = data_axis()
    return jax.lax.pmean(x, ax) if ax is not None else x

"""Jittable train/eval steps with data-parallel sharding over a device mesh.

Replaces the reference's DDP wiring (MMDistributedDataParallel + NCCL
all-reduce, mmdet3d/apis/seq_training_apis.py:20,146-151): under pjit, the
batch is sharded over the 'data' mesh axis, parameters are replicated, and
XLA inserts the gradient psum automatically. MaskedBatchNorm statistics are
computed over the global (all-device) voxel set, matching NaiveSyncBN."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sst_tpu.train.state import TrainState


def make_data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(devices, axis_names=("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a PointBatch with batch-major arrays on the mesh's data axis.

    Multi-host (jax.process_count() > 1, tools/train.py --coordinator): each
    process holds ITS OWN slice of the global batch (the loader's process
    shard), assembled into one global jax.Array via
    make_array_from_process_local_data — the counterpart of the reference's
    per-rank DataLoader + DDP (tools/dist_train.sh multi-node env)."""
    multiproc = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        spec = P("data", *([None] * (x.ndim - 1)))
        s = NamedSharding(mesh, spec)
        if multiproc:
            import numpy as np

            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, batch)


def train_step(model, state: TrainState, batch, rng,
               loss_kwargs: dict | None = None) -> tuple[TrainState, dict]:
    """One optimizer step. Call under jit; works on 1..N devices.
    loss_kwargs: static per-phase args (e.g. FSDDetectionSchedule's
    pretrain/thr_extra) forwarded to model.loss."""

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, method=model.loss,
            rngs={"shuffle": rng, "seeds": rng, "sampler": rng},
            mutable=["batch_stats"],
            **(loss_kwargs or {}),
        )
        total = sum(v for k, v in out.items() if k.startswith("loss"))
        return total, (out, mut["batch_stats"])

    (total, (metrics, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    metrics = dict(metrics)
    metrics["loss_total"] = total
    metrics["grad_norm"] = optax_global_norm(grads)
    return new_state, metrics


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_shard_map_train_step(model, mesh: Mesh,
                              loss_kwargs: dict | None = None,
                              axis: str = "data"):
    """DDP-exact train step: the whole step runs under shard_map over the
    data axis — per-shard loss (reference DDP semantics: gradient of the
    MEAN of per-rank losses, apis/seq_training_apis.py:146-151), explicit
    ``lax.pmean`` of grads, psum'd MaskedBatchNorm stats (NaiveSyncBN,
    ops/norm.py:29). Unlike the pjit path, every Pallas kernel sees a
    single-device shard, so the fused window-MHA and sorted segment-reduce
    fast paths stay on for multi-chip training (utils/dist.py)."""
    from sst_tpu.utils.dist import data_axis_ctx

    def per_shard(state, batch, rng):
        with data_axis_ctx(axis):
            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, train=True, method=model.loss,
                    rngs={"shuffle": rng, "seeds": rng, "sampler": rng},
                    mutable=["batch_stats"],
                    **(loss_kwargs or {}),
                )
                total = sum(
                    v for k, v in out.items() if k.startswith("loss"))
                return total, (out, mut["batch_stats"])

            (total, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(dict(metrics), axis)
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics["loss_total"] = jax.lax.pmean(total, axis)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    replicated = P()

    def batch_specs(batch):
        return jax.tree_util.tree_map(
            lambda x: P(axis, *([None] * (x.ndim - 1))), batch)

    def step(state, batch, rng):
        sm = jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(replicated, batch_specs(batch), replicated),
            out_specs=replicated,
            check_vma=False,
        )
        return sm(state, batch, rng)

    rep_sharding = NamedSharding(mesh, P())

    return jax.jit(
        step,
        in_shardings=(rep_sharding, None, rep_sharding),
        out_shardings=(rep_sharding, rep_sharding),
        donate_argnums=(0,),
    )


def make_jitted_train_step(model, mesh: Mesh | None = None,
                           loss_kwargs: dict | None = None):
    """jit the train step with replicated state and data-sharded batch.
    One compiled variant per distinct loss_kwargs (the FSD schedules quantize
    thr_extra so the variant count stays small)."""
    step = functools.partial(train_step, model, loss_kwargs=loss_kwargs)
    if mesh is None:
        return jax.jit(step)
    replicated = NamedSharding(mesh, P())

    return jax.jit(
        step,
        in_shardings=(replicated, None, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )

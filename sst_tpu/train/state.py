"""Train state + optimizer factory.

Replaces the reference's mmcv runner/optimizer stack (EpochBasedRunner,
Fp16OptimizerHook, grad clip — configs/_base_/schedules/*.py) with optax.
The reference SST schedule is AdamW + cyclic/cosine lr (cosine_2x.py)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )


def cosine_onecycle(base_lr: float, total_steps: int, pct_start: float = 0.4,
                    div_factor: float = 10.0, final_div: float = 1e4):
    """mmcv CyclicLrUpdater-style one-cycle cosine (cosine_2x.py semantics)."""
    return optax.join_schedules(
        [
            optax.cosine_onecycle_schedule(
                transition_steps=total_steps,
                peak_value=base_lr,
                pct_start=pct_start,
                div_factor=div_factor,
                final_div_factor=final_div,
            )
        ],
        [],
    )


def make_optimizer(base_lr: float = 1e-5, weight_decay: float = 0.05,
                   total_steps: int = 100000, clip_norm: float = 10.0,
                   betas=(0.9, 0.999)):
    sched = cosine_onecycle(base_lr, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(sched, b1=betas[0], b2=betas[1], weight_decay=weight_decay),
    )


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )

"""Capacity-overflow observability: static caps silently drop work, so the
drop counts must be visible in the training metrics (VERDICT weak #9)."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.flagship import tiny_sst, tiny_batch


def _losses(model, batch):
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    out, _ = model.apply(
        vars_, batch, train=True, method=model.loss,
        rngs={"shuffle": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    return out


def test_no_overflow_counters_zero():
    model = tiny_sst()
    batch = tiny_batch(batch_size=1, num_points=256)
    out = _losses(model, batch)
    assert "num_voxels" in out and "num_voxel_overflow_points" in out
    assert float(out["num_voxel_overflow_points"]) == 0.0
    assert float(out["num_voxels"]) > 0


def test_voxel_cap_overflow_is_observable():
    base = tiny_sst()
    # shrink the voxel cap far below the occupancy of a dense cloud
    model = base.clone(max_voxels=16)
    batch = tiny_batch(batch_size=1, num_points=512)
    out = _losses(model, batch)
    assert float(out["num_voxels"]) <= 16
    assert float(out["num_voxel_overflow_points"]) > 0
    # diagnostics must not leak into the optimized total
    total_keys = [k for k in out if k.startswith("loss")]
    assert "num_voxels" not in total_keys

"""Train-step + multi-device DP sharding tests on the virtual CPU mesh."""

import jax
import numpy as np

from sst_tpu.flagship import tiny_batch, tiny_sst
from sst_tpu.train import (
    create_train_state,
    make_data_mesh,
    make_jitted_train_step,
    make_optimizer,
    shard_batch,
)


def _setup():
    model = tiny_sst()
    batch = tiny_batch(batch_size=8, num_points=256)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    tx = make_optimizer(base_lr=1e-4, total_steps=100)
    state = create_train_state(model, variables, tx)
    return model, state, batch


def test_single_device_step():
    model, state, batch = _setup()
    step = make_jitted_train_step(model)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, new_state.params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_eight_device_dp_step():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    model, state, batch = _setup()
    mesh = make_data_mesh()
    with mesh:
        sharded = shard_batch(batch, mesh)
        step = make_jitted_train_step(model, mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_total"]))

    # numerical agreement with single-device on the same batch
    model2, state2, batch2 = _setup()
    step1 = make_jitted_train_step(model2)
    _, metrics1 = step1(state2, batch2, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(metrics["loss_total"]), float(metrics1["loss_total"]), rtol=2e-4
    )


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def _family_setup(mk_model, mk_batch, seed=0):
    rng = np.random.RandomState(seed)
    model = mk_model()
    batch = mk_batch(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1),
         "seeds": jax.random.PRNGKey(2)},
        batch, train=False,
    )
    state = create_train_state(
        model, variables, make_optimizer(base_lr=1e-4, total_steps=100))
    return model, state, batch


def _mesh_step(mk_model, mk_batch):
    """8-device DP train step executes with finite loss and real updates.

    (No mesh-vs-single numerical cross-check here: that would double the
    compile cost, and test_eight_device_dp_step already proves the
    mesh/single agreement property of make_jitted_train_step itself.)"""
    model, state, batch = _family_setup(mk_model, mk_batch)
    mesh = make_data_mesh()
    with mesh:
        sharded = shard_batch(batch, mesh)
        step = make_jitted_train_step(model, mesh)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(new_state.step) == 1


def test_fsd_two_stage_mesh_step():
    from sst_tpu.flagship import fsd_batch, tiny_fsd_two_stage

    _mesh_step(tiny_fsd_two_stage, lambda rng: fsd_batch(rng, b=8, p=512))


def test_fsdpp_temporal_batch_mesh_step():
    from sst_tpu.flagship import temporal_batch, tiny_fsdpp

    _mesh_step(tiny_fsdpp, lambda rng: temporal_batch(rng, b=8, p=512))


def test_ctrl_tracklet_batch_mesh_step():
    from sst_tpu.flagship import tiny_ctrl, tracklet_batch

    _mesh_step(tiny_ctrl, lambda rng: tracklet_batch(rng, b=8, p=256))

"""Test fixtures: force an 8-device virtual CPU mesh so sharding/collective
code paths are exercised without TPU hardware (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

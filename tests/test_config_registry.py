"""Config-space test (reference tests/test_runtime/test_config.py strategy):
every config under configs/ must load and build."""

import glob
import os

import pytest

import sst_tpu.models  # noqa: F401  (registers modules)
from sst_tpu.utils.builders import build_model_from_cfg
from sst_tpu.utils.config import deep_merge, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deep_merge_delete():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    ov = {"a": {"_delete_": True, "z": 9}, "c": 4}
    out = deep_merge(base, ov)
    assert out == {"a": {"z": 9}, "b": 3, "c": 4}


def test_base_inheritance():
    cfg = load_config(os.path.join(REPO, "configs/sst/sst_waymoD5_3class.py"))
    assert cfg["model"]["type"] == "DynamicVoxelNet"
    assert cfg["capacity"]["max_voxels"] == 65536
    assert len(cfg["region_batching_test"]) == 4


@pytest.mark.parametrize(
    "path",
    sorted(
        p for p in glob.glob(os.path.join(REPO, "configs/**/*.py"), recursive=True)
        if "_base_" not in p
    ),
)
def test_every_config_builds(path):
    cfg = load_config(path)
    for train in (True, False):
        model = build_model_from_cfg(cfg, train=train)
        assert model is not None


POINTBATCH_TYPES = ("DynamicVoxelNet", "PointPillars", "SingleStageFSD",
                    "FSD", "SingleStageFSDV2", "FSDV2")
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs/**/*.py"), recursive=True)
    if "_base_" not in p
)


@pytest.mark.slow
@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_every_config_init_traces_at_full_caps(path):
    """setup() + a full forward SHAPE trace at the config's real capacities
    (jax.eval_shape — no compile): catches constructor-kwarg collisions and
    cap/shape inconsistencies that lazy flax setup hides from the build-only
    test (e.g. a head dict repeating class_names crashed only at init)."""
    import jax
    import jax.numpy as jnp

    import sst_tpu.models  # noqa: F401  (registers)
    from sst_tpu.models import PointBatch
    from sst_tpu.utils.builders import build_model_from_cfg

    cfg = load_config(path)
    if cfg.get("model", {}).get("type") not in POINTBATCH_TYPES:
        pytest.skip("non-PointBatch family (FSD++/CTRL have their own tests)")
    model = build_model_from_cfg(cfg, train=True)
    npts = cfg.get("capacity", {}).get("max_points", 65536)
    batch = PointBatch(
        points=jnp.zeros((1, npts, 6), jnp.float32),
        valid=jnp.ones((1, npts), bool),
        gt_boxes=jnp.zeros((1, 48, 9), jnp.float32),
        gt_labels=jnp.zeros((1, 48), jnp.int32),
        gt_valid=jnp.ones((1, 48), bool),
    )
    rngs = {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1),
            "sampler": jax.random.PRNGKey(2)}
    jax.eval_shape(lambda b: model.init(rngs, b, train=False), batch)

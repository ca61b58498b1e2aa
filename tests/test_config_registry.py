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

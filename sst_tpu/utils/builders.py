"""Config-schema → model assembly helpers (the glue between python-file
configs and flax module construction)."""

from __future__ import annotations

from sst_tpu.ops.window import BucketSpec
from sst_tpu.utils.registry import MODELS


def buckets_from_cfg(region_batching: list[dict]) -> tuple:
    """[{max_tokens, drop_range, max_windows}] → tuple[BucketSpec]
    (the reference's drop_info + static window caps)."""
    out = []
    for rb in region_batching:
        lo, hi = rb["drop_range"]
        out.append(
            BucketSpec(
                max_tokens=rb["max_tokens"], drop_lower=lo, drop_upper=hi,
                max_windows=rb["max_windows"],
            )
        )
    return tuple(out)


def build_model_from_cfg(cfg: dict, train: bool = True):
    """Build a detector from a loaded config dict (model + capacity +
    region_batching_{train,test} keys)."""
    model_cfg = dict(cfg["model"])
    cap = cfg.get("capacity", {})
    rb_key = "region_batching_train" if train else "region_batching_test"
    kwargs = dict(model_cfg)
    if cap:
        kwargs.setdefault("max_voxels", cap.get("max_voxels", 65536))
        kwargs.setdefault("max_total_windows", cap.get("max_total_windows", 16384))
    if rb_key in cfg:
        kwargs["buckets"] = buckets_from_cfg(cfg[rb_key])
    return MODELS.build(kwargs)

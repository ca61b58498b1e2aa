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


def _tuplify(x):
    """Config lists → tuples (flax module attrs must be hashable/static)."""
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    if isinstance(x, tuple):
        return tuple(_tuplify(v) for v in x)
    if isinstance(x, dict):
        return {k: _tuplify(v) for k, v in x.items()}
    return x


def _convert_caps(kwargs: dict):
    """'caps' dicts in configs → the static caps dataclasses."""
    from sst_tpu.models.fsd import FSDCaps, FSDV2Caps

    cls_by_type = {
        "SingleStageFSD": FSDCaps, "SingleStageFSDV2": FSDV2Caps,
    }
    t = kwargs.get("type")
    if t in cls_by_type and isinstance(kwargs.get("caps"), dict):
        kwargs["caps"] = cls_by_type[t](**kwargs["caps"])
    inner_type = {"FSD": FSDCaps, "FSDV2": FSDV2Caps}
    if t in inner_type and isinstance(kwargs.get("single_stage"), dict):
        ss = dict(kwargs["single_stage"])
        if isinstance(ss.get("caps"), dict):
            ss["caps"] = inner_type[t](**ss["caps"])
        kwargs["single_stage"] = ss
    if t == "TwoStageFSDPP" and isinstance(kwargs.get("fsd"), dict):
        fsd = dict(kwargs["fsd"])
        if isinstance(fsd.get("single_stage"), dict):
            ss = dict(fsd["single_stage"])
            if isinstance(ss.get("caps"), dict):
                ss["caps"] = FSDCaps(**ss["caps"])
            fsd["single_stage"] = ss
        kwargs["fsd"] = fsd
    return kwargs


def build_model_from_cfg(cfg: dict, train: bool = True):
    """Build a detector from a loaded config dict (model + capacity +
    region_batching_{train,test} keys).

    A ``model.dtype`` string ('bfloat16' | 'float32') selects the compute
    policy — the TPU analog of the reference's fp16 runtime flag
    (configs/sst/*.py ``fp16 = dict(loss_scale=32.0)``); bf16 needs no loss
    scaling, so the single dtype knob is the whole policy."""
    model_cfg = _convert_caps(_tuplify(dict(cfg["model"])))
    if isinstance(model_cfg.get("dtype"), str):
        import jax.numpy as jnp

        model_cfg["dtype"] = {
            "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "fp32": jnp.float32,
        }[model_cfg["dtype"]]
    cap = cfg.get("capacity", {})
    rb_key = "region_batching_train" if train else "region_batching_test"
    kwargs = dict(model_cfg)
    if kwargs.get("type") == "DynamicVoxelNet":
        if cap:
            kwargs.setdefault("max_voxels", cap.get("max_voxels", 65536))
            kwargs.setdefault(
                "max_total_windows", cap.get("max_total_windows", 16384)
            )
        if rb_key in cfg:
            kwargs["buckets"] = buckets_from_cfg(cfg[rb_key])
    return MODELS.build(kwargs)

"""Registry + config-driven model assembly, preserving the reference's
``dict(type='Name', ...)`` API shape (mmdet3d/models/builder.py)."""

from __future__ import annotations

from typing import Any, Callable


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._modules: dict[str, Any] = {}

    def register(self, cls=None, *, name: str | None = None):
        def _do(c):
            key = name or c.__name__
            if key in self._modules and self._modules[key] is not c:
                raise KeyError(f"{key} already registered in {self.name}")
            self._modules[key] = c
            return c

        return _do(cls) if cls is not None else _do

    def get(self, key: str):
        if key not in self._modules:
            raise KeyError(
                f"{key!r} not found in registry {self.name}; have {sorted(self._modules)}"
            )
        return self._modules[key]

    def build(self, cfg: dict, **default_kwargs):
        cfg = dict(cfg)
        cls = self.get(cfg.pop("type"))
        kwargs = {**default_kwargs, **cfg}
        return cls(**kwargs)


MODELS = Registry("models")
DETECTORS = MODELS
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")


def build_detector(cfg: dict, **kwargs):
    """mmdet3d-compatible entry point (models/builder.py:47)."""
    return MODELS.build(cfg, **kwargs)

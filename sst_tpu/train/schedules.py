"""Step-dependent training schedules — the TPU-side formalization of the
reference's runtime_info hook side channel (SURVEY §5.6).

Rebuilds /root/reference/mmdet3d/core/hook/fsd_hooks.py:
  - EnableFSDDetectionHookIter (:70): segmentation-only warmup, then enable
    detection with a linearly decaying extra fg-score threshold
    (threshold_buffer) written into model.runtime_info. Here it is a pure
    function of the step, returned as explicit kwargs for the jitted loss
    (`pretrain`, `thr_extra`) — no mutable side channel, no recompilation
    (each (pretrain, thr_extra-bucket) pair is one compiled variant).
  - DisableAugmentationHook (:6): drop augmentation transforms for the last
    epochs; here a pipeline-filter applied when the step threshold is hit.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class FSDDetectionSchedule:
    """fsd_hooks.py:70 EnableFSDDetectionHookIter as a step function.

    Args mirror the hook: detection enabled at `enable_after` steps;
    threshold_buffer decays linearly from `buffer_start` to 0 between
    `enable_after` and `delay_buffer_until`. `quantize` buckets the decayed
    buffer so jit sees a small, finite set of static values (default 0.05
    steps ≈ the reference's practical resolution).
    """

    enable_after: int = 4000
    buffer_start: float = 0.3
    delay_buffer_until: int = 8000
    quantize: float = 0.05

    def __call__(self, step: int) -> dict:
        if step < self.enable_after:
            return dict(pretrain=True, thr_extra=0.0)
        if step >= self.delay_buffer_until or self.buffer_start <= 0:
            return dict(pretrain=False, thr_extra=0.0)
        span = max(self.delay_buffer_until - self.enable_after, 1)
        frac = 1.0 - (step - self.enable_after) / span
        buf = self.buffer_start * frac
        if self.quantize > 0:
            buf = round(buf / self.quantize) * self.quantize
        return dict(pretrain=False, thr_extra=float(buf))


@dataclasses.dataclass
class DisableAugmentationSchedule:
    """fsd_hooks.py:6 DisableAugmentationHook: from `disable_after_step`
    onward, strip the named transform types from a pipeline config list."""

    disable_after_step: int
    disabled_types: tuple = ("ObjectSample", "RandomFlip3D",
                             "GlobalRotScaleTrans")

    def filter_pipeline(self, pipeline_cfgs: list, step: int) -> list:
        if step < self.disable_after_step:
            return list(pipeline_cfgs)
        return [c for c in pipeline_cfgs
                if c.get("type") not in self.disabled_types]

    def boundary_crossed(self, prev_step: int, step: int) -> bool:
        """True when the loader pipeline must be rebuilt (the reference
        restarts the dataloader, fsd_hooks.py:34-53)."""
        return prev_step < self.disable_after_step <= step

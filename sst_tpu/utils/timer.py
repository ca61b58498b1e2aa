"""Named phase timers + jax profiler helpers.

Counterpart of the reference's TorchTimer (mmdet3d/utils/timer.py:4-53 —
named context managers with cuda.synchronize and periodic average printing)
for the TPU runtime. Two caveats on the axon remote backend:
  - block_until_ready does not synchronize; draining the queue requires a
    host fetch, so `Timer` fetches one scalar from the tracked output.
  - For op-level breakdowns use `trace()` (jax.profiler → xplane).
"""

from __future__ import annotations

import collections
import contextlib
import time


class Timer:
    """with timer('name', out): ...  — running averages printed every
    `print_interval` hits of each name (TorchTimer semantics)."""

    def __init__(self, print_interval: int = 20, enabled: bool = True):
        self.print_interval = print_interval
        self.enabled = enabled
        self.sums = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @staticmethod
    def _drain(out):
        if out is None:
            return
        import jax

        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            float(leaves[0].sum() if hasattr(leaves[0], "sum") else leaves[0])

    @contextlib.contextmanager
    def __call__(self, name: str, out=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            self._drain(holder.get("out", out))
            dt = time.perf_counter() - t0
            self.sums[name] += dt
            self.counts[name] += 1
            if self.counts[name] % self.print_interval == 0:
                avg = self.sums[name] / self.counts[name]
                print(f"[timer] {name}: avg {avg * 1e3:.2f} ms "
                      f"over {self.counts[name]} calls")

    def summary(self) -> dict:
        return {
            k: self.sums[k] / max(self.counts[k], 1) for k in self.sums
        }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sst_tpu_trace"):
    """jax.profiler trace context (xplane output; parse with
    tensorboard_plugin_profile or tools/analysis_tools/parse_xplane.py)."""
    import jax

    with jax.profiler.trace(logdir):
        yield logdir

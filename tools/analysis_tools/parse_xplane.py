"""Parse a jax.profiler xplane.pb into a per-op time breakdown.

Counterpart of the reference's profiling story (tools/train.py torch.profiler
import + TorchTimer): run a model under sst_tpu.utils.timer.trace(), then

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/analysis_tools/parse_xplane.py /tmp/sst_tpu_trace

prints device-time totals by op category and the top individual fusions.
The parsing core lives in sst_tpu.utils.profiling (shared with bench.py's
MFU/breakdown reporting).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

# must be set BEFORE the first protobuf import: under the default upb impl
# on this image the XSpace parses silently empty. Safe here — this CLI
# never imports jax (the axon RPC stack hangs under the python impl).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main(logdir: str, top: int = 30):
    from sst_tpu.utils.profiling import parse_xplane_dir

    bd = parse_xplane_dir(logdir)
    print(f"== device total: {bd['total_ms']:.2f} ms  "
          f"(MXU >= {bd['mxu_pct_lower_bound']:.1f}%)")
    print("-- by class --")
    for c, ms in bd["classes"].items():
        print(f"{ms:9.2f} ms  {c}")
    print("-- by category --")
    for c, ms in list(bd["categories"].items())[:12]:
        print(f"{ms:9.2f} ms  n={bd['counts'].get(c, 0):5d}  {c}")
    print(f"-- top {top} ops --")
    for n, ms in bd["top_ops"][:top]:
        print(f"{ms:9.2f} ms  {n}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sst_tpu_trace")

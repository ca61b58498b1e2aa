"""Parse a jax.profiler xplane.pb into a per-op time breakdown.

Counterpart of the reference's profiling story (tools/train.py torch.profiler
import + TorchTimer): run a model under sst_tpu.utils.timer.trace(), then

  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/analysis_tools/parse_xplane.py /tmp/sst_tpu_trace

prints device-time totals by op category and the top individual fusions.
"""

from __future__ import annotations

import collections
import glob
import re
import sys


def main(logdir: str, top: int = 30):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "needs tensorflow's xplane proto; set "
            "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if protobuf "
            "versions clash"
        ) from e

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        tot = collections.Counter()
        cnt = collections.Counter()
        indiv = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                if name.startswith("jit_"):
                    continue
                m = re.search(r"= \S+ (\w[\w-]*)\(", name)
                cat = m.group(1) if m else name.split(" ")[0]
                tot[cat] += ev.duration_ps
                cnt[cat] += 1
                indiv[name[:120]] += ev.duration_ps
        print(f"== plane: {plane.name}")
        print("-- by category --")
        for c, ps in tot.most_common(12):
            print(f"{ps / 1e9:9.2f} ms  n={cnt[c]:5d}  {c}")
        print(f"-- top {top} ops --")
        for n, ps in indiv.most_common(top):
            print(f"{ps / 1e9:9.2f} ms  {n}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sst_tpu_trace")

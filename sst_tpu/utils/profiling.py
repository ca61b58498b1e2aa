"""Xplane parsing + MFU accounting for the bench/driver pipeline.

Counterpart of the reference's profiling story (TorchTimer +
tools/analysis_tools/benchmark.py); on TPU the authoritative per-op numbers
come from jax.profiler xplane traces. This module turns a trace directory
into a machine-readable op-class breakdown so BENCH_r*.json can report MFU
and the gather/sort/NMS tail alongside raw FPS (VERDICT r2 weak #4).
"""

from __future__ import annotations

import collections
import glob
import os
import re

# bf16 peak of one TPU v5e (v5litepod) chip, FLOP/s. (197 TFLOPs bf16;
# fp32 ~ half.) Used for MFU = model_flops / (latency * PEAK).
TPU_V5E_BF16_PEAK = 197e12

# op-name → coarse class; anything else falls into its own bucket
_CLASS_PATTERNS = (
    ("mxu", r"convolution|dot|conv\b"),
    ("gather", r"gather|dynamic-slice\b"),
    ("scatter", r"scatter|dynamic-update-slice"),
    ("sort", r"sort"),
    ("reduce", r"reduce"),
    ("copy", r"copy|transpose|bitcast|broadcast|concatenate|reshape|slice"),
)


def parse_xplane_dir(logdir: str):
    """Parse the newest xplane.pb under ``logdir`` into
    {'total_ms', 'categories': {cat: ms}, 'classes': {cls: ms},
     'top_ops': [(name, ms), ...], 'mxu_pct_lower_bound'}.

    Device-plane events only (the TPU timeline); python/host lines ignored.
    Needs tensorflow's xplane proto with
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python set BEFORE any protobuf
    import: under the default (upb) impl on this image the XSpace parses
    silently EMPTY, and setting the env var late in a process that already
    imported jax both fails to switch the impl and (if set before jax) can
    hang the axon RPC stack. From a live-jax process, call
    ``parse_xplane_subprocess`` instead.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())

    # several planes can match "/device" (e.g. the empty Megascale trace
    # plane); analyze the one with the most events
    device_planes = [p for p in xs.planes
                     if "TPU" in p.name or "/device" in p.name]
    device_planes.sort(key=lambda p: sum(len(ln.events) for ln in p.lines))
    out = None
    for plane in device_planes[-1:]:
        md = {k: v.name for k, v in plane.event_metadata.items()}
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        tot = collections.Counter()
        cnt = collections.Counter()
        indiv = collections.Counter()
        flops_by_cat = collections.Counter()
        bytes_by_cat = collections.Counter()
        for line in plane.lines:
            # ONLY the synchronous op timeline: "Async XLA Ops"
            # (copy-start/slice-start prefetches) OVERLAP compute, and
            # "XLA Modules" spans everything — summing those would double
            # count (observed 3.6x wall time on the flagship trace)
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                if name.startswith("jit_"):
                    continue
                # the TPU profiler annotates each op event with its own
                # hlo_category / flops / bytes_accessed stats — use them
                cat = None
                ev_flops = ev_bytes = 0
                for st in ev.stats:
                    sn = stat_names.get(st.metadata_id)
                    if sn == "hlo_category":
                        cat = st.str_value or None
                    elif sn == "model_flops":
                        ev_flops = st.uint64_value or st.int64_value
                    elif sn == "bytes_accessed":
                        ev_bytes = st.uint64_value or st.int64_value
                if cat is None:
                    m = re.match(r"%([a-zA-Z][\w-]*?)(?:[._]\d+)* =", name)
                    cat = (m.group(1) if m else name.split(" ")[0])
                tot[cat] += ev.duration_ps
                cnt[cat] += 1
                flops_by_cat[cat] += ev_flops
                bytes_by_cat[cat] += ev_bytes
                indiv[name[:120]] += ev.duration_ps
        total_ms = sum(tot.values()) / 1e9
        classes = collections.Counter()
        for cat, ps in tot.items():
            for cls, pat in _CLASS_PATTERNS:
                if re.search(pat, cat, re.IGNORECASE):
                    classes[cls] += ps
                    break
            else:
                classes[cat] += ps
        # NOTE: on this backend fused convolutions carry generic
        # "%fusion.N" names and events have no hlo_category/flops stats,
        # so mxu_pct counts only NAME-identifiable MXU ops (a lower
        # bound); use cost-analysis MFU for the utilization headline.
        mxu_ps = sum(ps for cat, ps in tot.items()
                     if re.search(r"convolution|dot|matmul|einsum", cat,
                                  re.IGNORECASE))
        out = {
            "total_ms": round(total_ms, 2),
            "categories": {c: round(ps / 1e9, 2)
                           for c, ps in tot.most_common()},
            "classes": {c: round(ps / 1e9, 2)
                        for c, ps in classes.most_common()},
            "counts": dict(cnt),
            "top_ops": [(n, round(ps / 1e9, 2))
                        for n, ps in indiv.most_common(30)],
            "mxu_pct_lower_bound": round(
                100 * mxu_ps / max(sum(tot.values()), 1), 1),
        }
        if any(flops_by_cat.values()):
            out["flops_by_category"] = {
                c: int(v) for c, v in flops_by_cat.most_common(12)}
        if any(bytes_by_cat.values()):
            out["bytes_by_category"] = {
                c: int(v) for c, v in bytes_by_cat.most_common(12)}
    if out is None:
        raise RuntimeError(f"no device plane found in {files[-1]}")
    return out


def parse_xplane_subprocess(logdir: str):
    """parse_xplane_dir in a fresh process with the pure-python protobuf
    impl (see parse_xplane_dir docstring for why)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ,
               PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    code = ("import json, sys; "
            "from sst_tpu.utils.profiling import parse_xplane_dir; "
            "print('XPLANEJSON ' + json.dumps(parse_xplane_dir(sys.argv[1])))")
    r = subprocess.run([sys.executable, "-c", code, logdir], env=env,
                       cwd=repo, capture_output=True, text=True, timeout=300)
    for line in r.stdout.splitlines():
        if line.startswith("XPLANEJSON "):
            return json.loads(line[len("XPLANEJSON "):])
    raise RuntimeError(f"xplane parse subprocess failed rc={r.returncode}: "
                       f"{(r.stderr or r.stdout)[-300:]}")


def compiled_flops(compiled) -> float | None:
    """Model FLOPs from a jax Compiled's cost analysis (None if the backend
    doesn't expose it)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    f = ca.get("flops") if hasattr(ca, "get") else None
    return float(f) if f else None


def mfu(flops_per_step: float | None, step_seconds: float,
        peak: float = TPU_V5E_BF16_PEAK) -> float | None:
    if not flops_per_step or step_seconds <= 0:
        return None
    return round(flops_per_step / (step_seconds * peak), 4)


def trace_and_breakdown(fn, drain, logdir: str = "/tmp/sst_tpu_bench_trace",
                        iters: int = 2):
    """Run ``fn`` ``iters`` times under a jax.profiler trace and parse the
    per-op breakdown; returns the parse_xplane_dir dict with per-iteration
    ms. ``drain`` must host-fetch something from fn's output (axon: only
    host fetches drain the queue)."""
    import shutil

    import jax

    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(iters):
            o = fn()
        drain(o)
    bd = parse_xplane_subprocess(logdir)
    bd["iters"] = iters
    bd["per_iter_ms"] = round(bd["total_ms"] / iters, 2)
    bd["classes_per_iter_ms"] = {k: round(v / iters, 2)
                                 for k, v in bd["classes"].items()}
    return bd

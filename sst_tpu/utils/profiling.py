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
    ("mxu", r"convolution|dot|conv\b|:mxu"),
    ("gather", r"gather|dynamic-slice\b"),
    ("scatter", r"scatter|dynamic-update-slice"),
    ("sort", r"sort"),
    ("reduce", r"reduce"),
    ("copy", r"copy|transpose|bitcast|broadcast|concatenate|reshape|slice"),
)


def _shape_elems(shape_str: str) -> int:
    """'bf16[1,320,320,128]{...}' → element count (1 for scalars)."""
    m = re.search(r"\[([\d,]*)\]", shape_str)
    if not m or not m.group(1):
        return 1
    n = 1
    for d in m.group(1).split(","):
        n *= int(d)
    return n


def _shape_dims(shape_str: str):
    m = re.search(r"\[([\d,]*)\]", shape_str)
    if not m or not m.group(1):
        return ()
    return tuple(int(d) for d in m.group(1).split(","))


_FUSION_KIND_ORDER = (
    ("mxu", r"^(convolution|dot)"),
    ("gather", r"^(gather|dynamic-slice)"),
    ("scatter", r"^(scatter|dynamic-update-slice)"),
    ("sort", r"^sort"),
    ("reduce", r"^(reduce|reduce-window)"),
)


def classify_hlo_fusions(hlo_text: str):
    """Map each %fusion.N (and %while.N) in an HLO dump to the dominant op
    class of its fused computation, with an MXU-FLOP estimate for conv/dot
    bodies.

    The TPU profiler emits fusion events with generic names and no
    hlo_category stats (see parse_xplane_dir NOTE), so the per-class
    breakdown lumps ~75% of device time into one opaque 'fusion' bucket
    (VERDICT r04 weak #1). The compiled module text still knows what each
    fusion computes — this recovers it. Returns
    {op_name: {"class": str, "mxu_flops": int}}.
    """
    # computation bodies: "%name (params) -> type {" ... "}" (ENTRY lines
    # excluded); record op kinds + conv/dot flops per body
    bodies = {}
    cur = None
    defs = {}  # per-body: instruction name → its result shape string
    for line in hlo_text.splitlines():
        if cur is None:
            if re.match(r"\s*ENTRY\b", line):
                continue
            m = re.match(r"\s*%?([\w.-]+)\s*\(.*->.*\{", line)
            if m:
                cur = m.group(1)
                bodies[cur] = {"kinds": set(), "mxu_flops": 0}
                defs = {}
            continue
        if line.strip() == "}":
            cur = None
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\S+)\s+([\w-]+)\(",
                     line)
        if not m:
            continue
        res_name, out_shape, kind = m.group(1), m.group(2), m.group(3)
        defs[res_name] = out_shape
        b = bodies[cur]
        b["kinds"].add(kind)
        if kind in ("convolution", "dot"):
            ops = re.findall(r"\(([^()]*)\)", line)
            shapes = []
            for tok in (ops[0].split(",") if ops else []):
                tok = tok.strip()
                if "[" in tok:  # inline-shaped operand
                    shapes.append(tok)
                else:  # name reference → defining instruction's shape
                    shapes.append(defs.get(tok.lstrip("%"), ""))
            out_e = _shape_elems(out_shape)
            if kind == "convolution" and len(shapes) >= 2:
                rhs = _shape_dims(shapes[1])
                out_d = _shape_dims(out_shape)
                cout = rhs[-1] if rhs and out_d and rhs[-1] in out_d else \
                    max(rhs) if rhs else 1
                k_cin = 1
                for d in rhs:
                    k_cin *= d
                b["mxu_flops"] += 2 * out_e * (k_cin // max(cout, 1))
            elif kind == "dot" and shapes:
                lhs = _shape_dims(shapes[0])
                mc = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
                k = 1
                if mc and mc.group(1):
                    for i in mc.group(1).split(","):
                        if int(i) < len(lhs):
                            k *= lhs[int(i)]
                elif lhs:
                    k = lhs[-1]
                b["mxu_flops"] += 2 * out_e * k
    # fusion/while instructions anywhere in the text → called computation
    fmap = {}
    # result types may be tuples with spaces, so scan lazily up to the op
    for m in re.finditer(
            r"%([\w.-]+)\s*=\s*[^\n]*?\b(fusion|while)\([^\n]*?"
            r"(?:calls=|body=)%?([\w.-]+)", hlo_text):
        op, prefix, called = m.group(1), m.group(2), m.group(3)
        body = bodies.get(called)
        if body is None:
            continue
        cls = "elementwise"
        for c, pat in _FUSION_KIND_ORDER:
            if any(re.match(pat, k) for k in body["kinds"]):
                cls = c
                break
        fmap[op] = {"class": f"{prefix}:{cls}",
                    "mxu_flops": body["mxu_flops"]}
    return fmap


def parse_xplane_dir(logdir: str, hlo_path: str | None = None):
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

    if hlo_path is None:  # trace_and_breakdown drops the dump next door
        cand = os.path.join(logdir, "hlo.txt")
        hlo_path = cand if os.path.exists(cand) else None
    fmap = {}
    if hlo_path:
        with open(hlo_path) as f:
            fmap = classify_hlo_fusions(f.read())

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
                if fmap and cat in ("fusion", "while"):
                    m = re.match(r"%([\w.-]+)\s*=", name)
                    info = fmap.get(m.group(1)) if m else None
                    if info is not None:
                        cat = info["class"]
                        ev_flops = ev_flops or info["mxu_flops"]
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
                     if re.search(r"convolution|dot|matmul|einsum|:mxu", cat,
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
    impl (see parse_xplane_dir docstring for why). Picks up
    ``<logdir>/hlo.txt`` (if trace_and_breakdown wrote one) to decompose
    fusion events."""
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
                        iters: int = 2, hlo_text: str | None = None):
    """Run ``fn`` ``iters`` times under a jax.profiler trace and parse the
    per-op breakdown; returns the parse_xplane_dir dict with per-iteration
    ms. ``drain`` must host-fetch something from fn's output (axon: only
    host fetches drain the queue). Pass the compiled module's ``as_text()``
    as ``hlo_text`` to decompose fusion events into conv/gather/scatter/
    elementwise classes (classify_hlo_fusions)."""
    import shutil

    import jax

    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(iters):
            o = fn()
        drain(o)
    if hlo_text:
        with open(os.path.join(logdir, "hlo.txt"), "w") as f:
            f.write(hlo_text)
    bd = parse_xplane_subprocess(logdir)
    bd["iters"] = iters
    bd["per_iter_ms"] = round(bd["total_ms"] / iters, 2)
    bd["classes_per_iter_ms"] = {k: round(v / iters, 2)
                                 for k, v in bd["classes"].items()}
    return bd

"""Microbench: XLA scatter segment_reduce vs Pallas sorted_segment_reduce
(including the data gather into sorted order) vs indices_are_sorted scatter,
at flagship VFE shapes. Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sorted_reduce.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.ops.segment import segment_reduce, unique_segments
from sst_tpu.ops.sorted_reduce import sorted_segment_reduce


def slope(f, n1=3, n2=13):
    t0 = time.perf_counter()
    for i in range(n1):
        o = f(i)
    float(jax.tree_util.tree_leaves(o)[0].sum())
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n2):
        o = f(i)
    float(jax.tree_util.tree_leaves(o)[0].sum())
    tb = time.perf_counter() - t0
    return (tb - ta) / (n2 - n1)


def main():
    print("devices:", jax.devices(), flush=True)
    n, v = 196608, 131072
    rng = np.random.RandomState(0)
    # realistic voxel keys: ~60-70k occupied of a 12M grid
    keys = rng.randint(0, 1 << 23, n).astype(np.int32) % 70000
    valid = rng.rand(n) > 0.02
    uniq = jax.jit(unique_segments, static_argnames="num_segments")(
        jnp.asarray(keys), jnp.asarray(valid), v)
    seg = uniq.seg_ids
    order = uniq.order
    seg_s = jax.jit(lambda s, o: s[o])(seg, order)
    results = {}
    for c in (8, 64, 128):
        datas = [jnp.asarray(rng.randn(n, c).astype(np.float32))
                 for _ in range(3)]
        for mode in ("sum", "max"):
            f_sc = jax.jit(lambda d: segment_reduce(d, seg, v, mode))
            t_sc = slope(lambda i: f_sc(datas[i % 3]))

            def _sorted(d):
                return sorted_segment_reduce(d[order], seg_s, v, mode)
            f_so = jax.jit(_sorted)
            t_so = slope(lambda i: f_so(datas[i % 3]))

            # pre-sorted scatter with indices_are_sorted hint
            def _hint(d):
                ds = d[order]
                return jax.ops.segment_sum(
                    ds, seg_s, num_segments=v, indices_are_sorted=True
                ) if mode == "sum" else jax.ops.segment_max(
                    ds, seg_s, num_segments=v, indices_are_sorted=True)
            f_h = jax.jit(_hint)
            t_h = slope(lambda i: f_h(datas[i % 3]))

            # correctness spot check
            a = np.asarray(f_sc(datas[0]))
            b = np.asarray(f_so(datas[0]))
            if mode == "max":
                a = np.where(np.isfinite(a), a, 0)
            err = float(np.abs(a - b).max())
            results[f"c{c}_{mode}"] = dict(
                scatter_ms=round(t_sc * 1e3, 3),
                sorted_kernel_ms=round(t_so * 1e3, 3),
                sorted_hint_scatter_ms=round(t_h * 1e3, 3),
                max_abs_err=err,
            )
            print(f"c{c} {mode}: {results[f'c{c}_{mode}']}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

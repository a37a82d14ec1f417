"""Round-3 batch B: find the ~13 ms/chunk gap between the flagship's
measured 51.9 ms at 2^24 and its stage budget (front 2.5 + sort 34 +
RLE 1.8).  Stage-isolated timings under the bench protocol, then a
profiler trace with per-HLO device times.
"""

import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(step, reps=8):
    out = step()
    int(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        int(np.asarray(jax.tree_util.tree_leaves(o)[-1]).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from functools import partial

    from kmers_tpu.ops.count import sort_count
    from kmers_tpu.ops.pallas.window_kernel import (
        canonical_windows_u32_pallas,
    )
    from kmers_tpu.pipelines.canonical_count import (
        _chunk_count_u32,
        _pad_to_u32_view,
        _V_U32,
    )

    K = 31
    L = 1 << 24
    rng = np.random.default_rng(0)
    data = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    v, _ = _pad_to_u32_view(data)
    arg = jax.device_put(v)

    # 1. full pipeline (bench protocol)
    emit(full_ms=round(timed(lambda: _chunk_count_u32(arg, K)), 1))

    # 2. front-end alone — return the scalar counters (cheap fetch)
    fe = jax.jit(
        lambda a: canonical_windows_u32_pallas(a, K, V=_V_U32)[2:]
    )
    emit(frontend_ms=round(timed(lambda: fe(arg)), 1))

    # 3. front-end + sort (no RLE): fold sort output to a scalar
    @jax.jit
    def fe_sort(a):
        hi, lo, nb, na = canonical_windows_u32_pallas(a, K, V=_V_U32)
        shi, slo = jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
        return shi[-1] + slo[-1]

    emit(frontend_sort_ms=round(timed(lambda: fe_sort(arg)), 1))

    # 4. front-end + sort + RLE (= full minus nothing; sanity)
    @jax.jit
    def fe_sort_rle(a):
        hi, lo, nb, na = canonical_windows_u32_pallas(a, K, V=_V_U32)
        uh, ul, cnt, nu = sort_count(hi, lo, None, use_pallas=True)
        return nu

    emit(frontend_sort_rle_ms=round(timed(lambda: fe_sort_rle(arg)), 1))

    # 5. sort alone on materialized front-end outputs
    hi, lo, _, _ = jax.jit(
        lambda a: canonical_windows_u32_pallas(a, K, V=_V_U32)
    )(arg)
    hi, lo = jax.device_put(np.asarray(hi)), jax.device_put(np.asarray(lo))
    s = jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False)[0][-1]
    )
    emit(sort_only_ms=round(timed(lambda: s(hi, lo)), 1))

    # 6. profiler trace of the full pipeline: top HLOs by device time
    with jax.profiler.trace("/tmp/r3b_trace"):
        outs = [_chunk_count_u32(arg, K) for _ in range(2)]
        for o in outs:
            int(np.asarray(o[3]))
    time.sleep(1)
    paths = glob.glob("/tmp/r3b_trace/**/*.trace.json.gz", recursive=True)
    if paths:
        ev = json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]
        dur = {}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                pid = e.get("pid", 0)
                dur[name] = dur.get(name, 0) + e["dur"]
        top = sorted(dur.items(), key=lambda kv: -kv[1])[:18]
        for name, us in top:
            emit(hlo=name[:80], ms_total=round(us / 1e3, 1))
    emit(done="batch_b")


if __name__ == "__main__":
    main()

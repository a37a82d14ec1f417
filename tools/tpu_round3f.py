"""Round-3 batch F (post-recovery recapture): headline bench, all-config
artifacts, scaling n=1, the in-pipeline sort-layout probe, and device
parity of the new table-merge op.  Run under `timeout`.
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(step, fetch, reps=8):
    out = step()
    fetch(out)
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
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

    # 0. health + headline
    fetch3 = lambda o: int(np.asarray(o[3]))  # noqa: E731
    full = timed(lambda: _chunk_count_u32(arg, K), fetch3, reps=16)
    emit(flagship_ms=round(full, 1), mbases_per_s=round(L / full / 1e3, 1))

    # 1. sort-layout probe: does splitting FE | sort+RLE into two
    # dispatches (or an optimization_barrier) recover the standalone
    # sort cost (30.6 ms) vs the in-pipeline sort.0 (34.9 ms)?
    fe = jax.jit(lambda a: canonical_windows_u32_pallas(a, K, V=_V_U32))

    @jax.jit
    def count_only(hi, lo):
        return sort_count(hi, lo, None, use_pallas=True)

    def split_step():
        hi, lo, nb, na = fe(arg)
        return count_only(hi, lo)

    emit(split_dispatch_ms=round(timed(split_step, fetch3, reps=16), 1))

    @jax.jit
    def barrier_step(a):
        hi, lo, nb, na = canonical_windows_u32_pallas(a, K, V=_V_U32)
        hi, lo = jax.lax.optimization_barrier((hi, lo))
        return sort_count(hi, lo, None, use_pallas=True)

    emit(barrier_ms=round(timed(lambda: barrier_step(arg), fetch3, reps=16), 1))

    # 2. table-merge device parity (new pipelines/tables.py)
    from kmers_tpu.pipelines.tables import merge_counts, merge_counts_device

    ka = np.sort(rng.choice(1 << 40, 5000, replace=False)).astype(np.uint64)
    kb = np.sort(rng.choice(1 << 40, 4000, replace=False)).astype(np.uint64)
    ca = rng.integers(1, 9, ka.size).astype(np.int64)
    cb = rng.integers(1, 9, kb.size).astype(np.int64)
    hk, hc = merge_counts(ka, ca, kb, cb)
    dk, dc = merge_counts_device(ka, ca, kb, cb)
    emit(table_merge_device_parity=bool(
        np.array_equal(hk, dk) and np.array_equal(hc, dc)
    ))

    # 3. bench.py + bench_all + scaling as subprocesses (artifacts)
    for cmd, tag in (
        ([sys.executable, "/root/repo/bench.py"], "bench"),
        ([sys.executable, "/root/repo/tools/bench_all.py"], "bench_all"),
        ([sys.executable, "/root/repo/tools/scaling_bench.py"], "scaling"),
    ):
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1200,
            cwd="/root/repo",
        )
        lines = [
            l for l in r.stdout.strip().splitlines() if l.startswith("{")
        ]
        emit(sub=tag, rc=r.returncode, out=lines[-8:])

    emit(done="batch_f")


if __name__ == "__main__":
    main()

"""Round-6 batch A: flagship chunk-size sweep + steady-state protocol.

VERDICT r3 item 1: the 10x gate sits inside run-to-run variance at
chunk=2^24.  Sort is O(n log n) (XLA's bitonic-ish comparator network:
~210 stages at 2^20 vs 300 at 2^24), so smaller chunks trade fewer
stages/element against more dispatch overhead.  Stage math predicts
2^20-2^22 wins ~20-30% — measure where the knee is.

Protocol: for each chunk size 2^logL, pre-stage 2^24/2^logL device
arguments (device_put outside the timed loop, same as bench.py) and
time enqueueing ALL dispatches for 2^24 bases x reps, fetching one
scalar per dispatch stream at the end.  Median of 3.

Prints one JSON line per config; aborts early if the chip is degraded.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


rng = np.random.default_rng(0)

from kmers_tpu.pipelines.canonical_count import (  # noqa: E402
    _chunk_count_u32,
    _pad_to_u32_view,
)

# health probe first (tiny op, bounded)
t0 = time.perf_counter()
x = jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(x))
probe = time.perf_counter() - t0
emit(config="probe", secs=round(probe, 2))

TOT = 1 << 24  # bases per logical rep
data_full = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, TOT)]
K = 31


def steady(args, reps):
    # warm
    out = _chunk_count_u32(args[0], K)
    int(np.asarray(out[3]))
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        for a in args:
            outs.append(_chunk_count_u32(a, K))
    for o in outs:
        int(np.asarray(o[3]))
    return (time.perf_counter() - t0) / reps  # seconds per TOT bases


results = {}
for logL in (20, 21, 22, 23, 24):
    L = 1 << logL
    n_chunks = TOT // L
    args = []
    for c in range(n_chunks):
        v, _ = _pad_to_u32_view(data_full[c * L : (c + 1) * L].copy())
        args.append(jax.device_put(v))
    reps = 16
    dts = sorted(steady(args, reps) for _ in range(3))
    dt = dts[1]
    mbs = TOT / dt / 1e6
    results[logL] = mbs
    emit(
        config=f"flagship_chunk_2^{logL}",
        ms_per_2_24=round(dt * 1e3, 2),
        mbases_s=round(mbs, 1),
        spread_pct=round(100 * (dts[2] - dts[0]) / dts[1], 1),
        n_chunks=n_chunks,
    )
    if dt > 0.16:
        emit(abort="chip degraded")
        sys.exit(1)
    del args

best = max(results, key=results.get)
emit(best_chunk=f"2^{best}", mbases_s=round(results[best], 1))
emit(done="round6a")

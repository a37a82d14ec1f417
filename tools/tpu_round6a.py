"""Round-6 batch A: flagship chunk-size sweep + steady-state protocol.

VERDICT r3 item 1: the 10x gate sits inside run-to-run variance at
chunk=2^24.  Sort is O(n log n) (253 comparator stages at 2^22 vs 300
at 2^24), so smaller chunks trade fewer stages/element against more
dispatch overhead and level-stack merge work.  Find the knee.

Prints one JSON line per config; abort early if the chip is degraded.
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

data_full = np.frombuffer(b"ACGT", dtype=np.uint8)[
    rng.integers(0, 4, 1 << 25)
]


def steady(step, reps):
    out = step()
    int(np.asarray(out[3]))
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        int(np.asarray(o[3]))
    return (time.perf_counter() - t0) / reps


K = 31
results = {}
for logL in (22, 23, 24, 25):
    L = 1 << logL
    v, _ = _pad_to_u32_view(data_full[:L])
    arg = jax.device_put(v)
    step = lambda: _chunk_count_u32(arg, K)  # noqa: E731
    reps = max((1 << 24) // L * 16, 4)
    # median of 3
    dts = sorted(steady(step, reps) for _ in range(3))
    dt = dts[1]
    mbs = L / dt / 1e6
    results[logL] = mbs
    emit(
        config=f"flagship_chunk_2^{logL}",
        ms=round(dt * 1e3, 2),
        mbases_s=round(mbs, 1),
        spread_pct=round(100 * (dts[2] - dts[0]) / dts[1], 1),
        reps=reps,
    )
    if dt * 1e3 > 40 * (L / (1 << 24)) * 4:
        emit(abort="chip degraded")
        sys.exit(1)

best = max(results, key=results.get)
emit(best_chunk=f"2^{best}", mbases_s=round(results[best], 1))
emit(done="round6a")

"""Round-2 batch D: identify straggler HLO ops, validate lean RLE on
device, sweep chunk sizes for the headline bench."""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from kmers_tpu.pipelines.canonical_count import _chunk_count
    from kmers_tpu.ops.count import sort_count

    rng = np.random.default_rng(0)

    # 1. optimized-HLO names for the stragglers
    data26 = np.zeros(1 << 26, np.uint8)
    compiled = _chunk_count.lower(data26, 31, True).compile()
    txt = compiled.as_text()
    for marker in (
        "reshape.104", "reshape.8 ", "shift-left_reduce_fusion",
        "%copy", "pad.11", "pad.12",
    ):
        for line in txt.splitlines():
            if marker in line:
                print("HLO:", line.strip()[:240], flush=True)
                break

    # 2. lean RLE parity on device
    hi = jax.device_put(rng.integers(0, 1 << 8, 1 << 16, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 4, 1 << 16, np.uint32))
    a = sort_count(hi, lo, None, use_pallas=False)
    b = sort_count(hi, lo, None, use_pallas=True)
    ok = all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))
    print(json.dumps({"lean_rle_parity": bool(ok), "nu": int(a[3])}), flush=True)

    # 3. chunk-size sweep (steady-state, fetch-once protocol)
    for lg in (26, 25, 24, 23, 22):
        L = 1 << lg
        data = jax.device_put(
            np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
        )
        out = _chunk_count(data, 31, True)
        int(np.asarray(out[3]))
        reps = max(4, (1 << 27) // L // 2)
        t0 = time.perf_counter()
        outs = [_chunk_count(data, 31, True) for _ in range(reps)]
        for o in outs:
            int(np.asarray(o[3]))
        dt = (time.perf_counter() - t0) / reps
        print(
            json.dumps(
                {
                    "chunk": f"2^{lg}",
                    "ms": round(dt * 1e3, 1),
                    "bases_per_sec": round(L / dt),
                    "vs_baseline": round(L / dt / 5e7, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

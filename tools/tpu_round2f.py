"""Round-2 batch F: device-validate the (8,W) RLE + minhash u32 path,
re-run bench.py protocol, then all five configs (bench_all)."""

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from kmers_tpu.ops.count import sort_count
    from kmers_tpu.pipelines.minhash import minhash_sketch

    rng = np.random.default_rng(3)

    # 1. (8, W) RLE device parity vs the jnp RLE on real duplicates
    hi = jax.device_put(rng.integers(0, 1 << 10, 1 << 20, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 3, 1 << 20, np.uint32))
    a = sort_count(hi, lo, None, use_pallas=False)
    b = sort_count(hi, lo, None, use_pallas=True)
    ok = all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b)
    )
    print(json.dumps({"rle8_device_parity": bool(ok), "nu": int(a[3])}), flush=True)

    # 2. minhash u32 path device parity + timing
    L = 1 << 24
    data = bytes(
        np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, L)]
    )
    s0 = minhash_sketch(data, K=16, s=1000, use_pallas=False)
    s1 = minhash_sketch(data, K=16, s=1000, use_pallas=True)
    print(
        json.dumps({"minhash_u32_parity": bool(np.array_equal(s0, s1))}),
        flush=True,
    )
    t0 = time.perf_counter()
    for _ in range(3):
        minhash_sketch(data, K=16, s=1000, use_pallas=True)
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({"minhash_mbases_per_s": round(L / dt / 1e6, 1)}), flush=True)

    # 3. RLE timing at 2^26 (isolated)
    hi = jax.device_put(rng.integers(0, 1 << 30, 1 << 26, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, 1 << 26, np.uint32))
    from kmers_tpu.ops.pallas.rle_kernel import rle_unit_pallas

    fn = jax.jit(lambda a, b: rle_unit_pallas(a, b))
    out = fn(hi, lo)
    int(np.asarray(out[3]))
    t0 = time.perf_counter()
    outs = [fn(hi, lo) for _ in range(4)]
    for o in outs:
        int(np.asarray(o[3]))
    print(
        json.dumps({"rle8_ms_2^26": round((time.perf_counter() - t0) / 4 * 1e3, 1)}),
        flush=True,
    )


if __name__ == "__main__":
    main()

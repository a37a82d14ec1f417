"""Round-2 batch E: u32 front-end on device — parity, profile, bench."""

import collections
import glob
import gzip
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from kmers_tpu.pipelines.canonical_count import (
        CountConfig,
        _chunk_count,
        _chunk_count_u32,
        _pad_to_u32_view,
        canonical_count_bytes,
    )

    rng = np.random.default_rng(5)

    # 1. device parity: u32 path vs jnp path on mixed ACGTN at 2^22
    L = 1 << 22
    data = np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, L)]
    k0, c0 = canonical_count_bytes(
        data, CountConfig(K=31, chunk_size=L, use_pallas=False)
    )
    k1, c1 = canonical_count_bytes(
        data, CountConfig(K=31, chunk_size=L, use_pallas=True)
    )
    ok = np.array_equal(k0, k1) and np.array_equal(c0, c1)
    print(json.dumps({"u32_pipeline_parity": bool(ok), "distinct": len(k0)}), flush=True)

    # streaming (multi-chunk) parity too
    k2, c2 = canonical_count_bytes(
        data, CountConfig(K=31, chunk_size=1 << 20, use_pallas=True)
    )
    ok2 = np.array_equal(k0, k2) and np.array_equal(c0, c2)
    print(json.dumps({"u32_streaming_parity": bool(ok2)}), flush=True)

    # 2. profile at 2^26
    big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 26)]
    v, _ = _pad_to_u32_view(big)
    arg = jax.device_put(v)

    def run():
        out = _chunk_count_u32(arg, 31)
        int(np.asarray(out[3]))

    run()
    d = "/tmp/tb_u32"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    run()
    jax.profiler.stop_trace()
    tr = sorted(glob.glob(f"{d}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr) as f:
        t = json.load(f)
    durs = collections.Counter()
    pid_dev = None
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e["args"].get("name")):
                pid_dev = e["pid"]
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") == pid_dev:
            durs[e.get("name", "?")] += e["dur"]
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[:10]:
        print(f"PROF {dur/1e3:9.2f} ms  {name[:100]}", flush=True)

    # 3. chunk sweep with the u32 path
    for lg in (26, 25, 24, 23):
        Ls = 1 << lg
        d8 = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, Ls)]
        vs, _ = _pad_to_u32_view(d8)
        a = jax.device_put(vs)
        out = _chunk_count_u32(a, 31)
        int(np.asarray(out[3]))
        reps = max(4, (1 << 27) // Ls // 2)
        t0 = time.perf_counter()
        outs = [_chunk_count_u32(a, 31) for _ in range(reps)]
        for o in outs:
            int(np.asarray(o[3]))
        dt = (time.perf_counter() - t0) / reps
        print(
            json.dumps(
                {
                    "chunk": f"2^{lg}",
                    "ms": round(dt * 1e3, 1),
                    "bases_per_sec": round(Ls / dt),
                    "vs_baseline": round(Ls / dt / 5e7, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

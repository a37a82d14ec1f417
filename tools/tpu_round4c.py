"""Round-4 batch C: artifact recapture on a healthy chip.

Produces SHARDED_r03.json (sharded-on-1-device vs flagship), a
streaming-throughput measurement, and runs bench.py / bench_all.py /
scaling_bench.py as subprocesses so their artifacts land too.  Run
under `timeout` AFTER tools/tpu_round4b.py confirms chip health.
"""

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from kmers_tpu.parallel import (
        ShardedCountConfig,
        data_mesh,
        sharded_canonical_count,
    )
    from kmers_tpu.pipelines import CountConfig, StreamingCounter
    from kmers_tpu.pipelines.canonical_count import canonical_count_bytes

    out = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    L = 1 << 24
    rng = np.random.default_rng(7)
    base = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    data = bytes(base)

    # flagship reference result + steady-state wall (full pipeline incl.
    # host materialization)
    t0 = time.perf_counter()
    ref_k, ref_c = canonical_count_bytes(data, CountConfig(K=31))
    out["flagship_first_call_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    for _ in range(3):
        canonical_count_bytes(data, CountConfig(K=31))
    dt = (time.perf_counter() - t0) / 3
    out["flagship_pipeline_bases_per_s"] = round(L / dt)

    # sharded on the 1-chip mesh: parity + steady state
    mesh = data_mesh(1)
    cfg = ShardedCountConfig(K=31)
    t0 = time.perf_counter()
    k, c = sharded_canonical_count(data, cfg, mesh)
    out["sharded_first_call_s"] = round(time.perf_counter() - t0, 2)
    ok = bool(np.array_equal(k, ref_k) and np.array_equal(c, ref_c))
    t0 = time.perf_counter()
    for _ in range(3):
        sharded_canonical_count(data, cfg, mesh)
    dt = (time.perf_counter() - t0) / 3
    out["sharded_1dev"] = {
        "ok": ok,
        "bases_per_s": round(L / dt),
        "vs_flagship": round(
            (L / dt) / out["flagship_pipeline_bases_per_s"], 3
        ),
    }
    emit(**out)

    # streamed sharded (3 chunks per device) parity on device
    cfg_s = ShardedCountConfig(K=31, chunk_size=L // 3 + 1024)
    t0 = time.perf_counter()
    k2, c2 = sharded_canonical_count(data, cfg_s, mesh)
    out["sharded_streamed"] = {
        "ok": bool(np.array_equal(k2, ref_k) and np.array_equal(c2, ref_c)),
        "first_call_s": round(time.perf_counter() - t0, 2),
    }

    # single-chip streaming throughput (StreamingCounter over 4 batches)
    sc = StreamingCounter(CountConfig(K=31))
    quarter = bytes(base[: L // 4])
    sc.update(quarter)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        sc.update(quarter)
    dt = time.perf_counter() - t0
    out["streaming_update_bases_per_s"] = round(3 * (L // 4) / dt)
    emit(**{k: v for k, v in out.items() if k.startswith(("sharded_s", "streaming"))})

    with open("/root/repo/SHARDED_r03.json", "w") as f:
        json.dump(out, f, indent=1)

    # artifact subprocesses
    for cmd, tag in (
        ([sys.executable, "/root/repo/bench.py"], "bench"),
        ([sys.executable, "/root/repo/tools/bench_all.py"], "bench_all"),
        ([sys.executable, "/root/repo/tools/scaling_bench.py"], "scaling"),
    ):
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
            cwd="/root/repo",
        )
        lines = [
            l for l in r.stdout.strip().splitlines() if l.startswith("{")
        ]
        emit(sub=tag, rc=r.returncode, out=lines[-10:])

    emit(done="round4c")


if __name__ == "__main__":
    main()

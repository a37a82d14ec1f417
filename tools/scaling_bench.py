"""Scaling-efficiency benchmark: bases/sec at 1..N devices.

Measures the sharded canonical-counting pipeline over growing meshes and
reports scaling efficiency relative to 1 device (the BASELINE.json >=80%
target).  On this sandbox only 1 real chip exists; run on a pod slice
(or with XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU for
functional validation — CPU numbers are not meaningful for throughput).
"""

import json
import time

import numpy as np


def main():
    import jax

    from kmers_tpu.parallel import (
        ShardedCountConfig,
        data_mesh,
        sharded_canonical_count,
    )

    n_avail = len(jax.devices())
    L = 1 << 24
    rng = np.random.default_rng(0)
    data = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)])

    sizes = []
    n = 1
    while n <= n_avail:
        sizes.append(n)
        n *= 2
    if sizes[-1] != n_avail:
        sizes.append(n_avail)  # always measure the full slice

    results = []
    base = None
    for n in sizes:
        mesh = data_mesh(n)
        cfg = ShardedCountConfig(K=31)
        sharded_canonical_count(data, cfg, mesh)  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(3):
            sharded_canonical_count(data, cfg, mesh)
        dt = (time.perf_counter() - t0) / 3
        tput = L / dt
        if base is None:
            base = tput
        eff = tput / (base * n)
        results.append(
            {"devices": n, "bases_per_sec": round(tput), "efficiency": round(eff, 3)}
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()

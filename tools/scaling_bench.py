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

    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmers_tpu.parallel.pipeline import (
        _shard_with_halo,
        sharded_count_step,
    )

    arr = np.frombuffer(data, dtype=np.uint8)
    results = []
    base = None
    for n in sizes:
        import jax

        mesh = data_mesh(n)
        K = 31
        shards, shard = _shard_with_halo(arr.copy(), n, K)
        cap = int(np.ceil(shard * 2.0 / n))
        use_pallas = jax.default_backend() not in ("cpu",)
        step = sharded_count_step(mesh, K, shard, cap, use_pallas)
        sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
        shards_dev = jax.device_put(shards, sharding)
        # measure the device-side SPMD counting step (the full pipeline's
        # host materialization fetches the padded table over the
        # transport, which benchmarks the link, not the counting)
        out = step(shards_dev)
        int(np.asarray(out[3])[0])  # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        outs = [step(shards_dev) for _ in range(reps)]
        for o in outs:
            int(np.asarray(o[3])[0])
        dt = (time.perf_counter() - t0) / reps
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

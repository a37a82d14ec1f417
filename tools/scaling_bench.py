"""Scaling-efficiency benchmark of the sharded counting step.

Weak scaling: FIXED per-device load, growing device count — the quantity
that demonstrates the exchange's algorithmic scaling (BASELINE.json's
>=80% target is for real pods; on this sandbox only 1 real chip exists,
so the virtual CPU mesh run documents the algorithm's scaling while the
hardware run stays blocked on a multi-chip slice).

Per device count n in {1, 2, 4, 8, ...}: counts n * L_dev bases sharded
over n devices and reports bases/sec and efficiency vs the 1-device
throughput times n.  Prints one JSON line (a list of points).
"""

import json
import time

import numpy as np


def main():
    import os

    if os.environ.get("SCALING_CPU_MESH"):
        # virtual-mesh run: the axon PJRT plugin force-sets
        # jax_platforms at registration, overriding JAX_PLATFORMS —
        # select CPU through the config API (tests/conftest.py pattern)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count="
            + os.environ["SCALING_CPU_MESH"]
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmers_tpu.parallel import data_mesh
    from kmers_tpu.parallel.pipeline import (
        _pick_v,
        _rows_to_u32_view,
        _shard_with_halo,
        sharded_count_step,
    )

    n_avail = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    # per-device load: big enough that per-dispatch overhead amortizes
    L_dev = 1 << 24 if on_tpu else 1 << 20
    K = 31
    rng = np.random.default_rng(0)

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
        L = n * L_dev
        arr = np.frombuffer(b"ACGT", dtype=np.uint8)[
            rng.integers(0, 4, L)
        ].copy()
        shards, shard = _shard_with_halo(arr, n, K, pad_byte=ord("N"))
        cap = int(np.ceil(shard * 2.0 / n))
        V = _pick_v(shards.shape[1]) if on_tpu else 4096
        step = sharded_count_step(mesh, K, shard, cap, on_tpu, False, V)
        view = _rows_to_u32_view(shards, V) if on_tpu else shards
        sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
        shards_dev = jax.device_put(view, sharding)
        # measure the device-side SPMD counting step (the full pipeline's
        # host materialization fetches the padded table over the
        # transport, which benchmarks the link, not the counting)
        out = step(shards_dev)
        int(np.asarray(out[3])[0])  # compile + warmup
        reps = 4 if on_tpu else 2
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
            {
                "devices": n,
                "bases_total": L,
                "bases_per_sec": round(tput),
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Real-chip shakeout of the sharded shard_map+all_to_all counting program.

Round-1 left this device-untested (the chip wedged when this program was
first compiled).  Runs sharded_canonical_count on a 1-device TPU mesh with
and without the Mosaic kernel, checks parity vs the single-chip pipeline,
and writes SHARDED_r02.json.  Run under `timeout`; exits cleanly.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from kmers_tpu.parallel import (
        ShardedCountConfig,
        data_mesh,
        sharded_canonical_count,
    )
    from kmers_tpu.pipelines.canonical_count import (
        CountConfig,
        canonical_count_bytes,
    )

    out = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    L = 1 << 22  # 4M bases: small enough to compile/run fast, real enough
    rng = np.random.default_rng(7)
    base = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    data = bytes(base)

    # ground truth from the single-chip pipeline (itself parity-tested)
    t0 = time.perf_counter()
    ref_k, ref_c = canonical_count_bytes(
        data, CountConfig(K=31, chunk_size=L)
    )
    out["single_chip_secs"] = round(time.perf_counter() - t0, 3)

    mesh = data_mesh(1)
    for use_pallas in (False, True):
        tag = "pallas" if use_pallas else "jnp"
        t0 = time.perf_counter()
        k, c = sharded_canonical_count(
            data, ShardedCountConfig(K=31, use_pallas=use_pallas), mesh
        )
        dt = time.perf_counter() - t0
        ok = bool(
            k.shape == ref_k.shape
            and np.array_equal(k, ref_k)
            and np.array_equal(c, ref_c)
        )
        out[f"sharded_{tag}"] = {
            "ok": ok,
            "first_call_secs": round(dt, 3),
            "n_unique": int(k.shape[0]),
        }
        # steady-state timing (compiled)
        t0 = time.perf_counter()
        sharded_canonical_count(
            data, ShardedCountConfig(K=31, use_pallas=use_pallas), mesh
        )
        out[f"sharded_{tag}"]["warm_secs"] = round(time.perf_counter() - t0, 3)
        out[f"sharded_{tag}"]["bases_per_sec"] = round(
            L / (time.perf_counter() - t0 + 1e-12)
        )
        print(json.dumps({tag: out[f"sharded_{tag}"]}), flush=True)

    with open("SHARDED_r02.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Real-TPU smoke test: pallas-path parity + throughput sanity.

Run manually (or by the driver) on a machine with a TPU backend:
    python tools/tpu_smoke.py
Exercises what the CPU test suite cannot: Mosaic kernel compilation and
the pallas-vs-jnp pipeline parity on device.
"""

import sys
import time

import numpy as np


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    from kmers_tpu.pipelines.canonical_count import CountConfig, canonical_count_bytes

    rng = np.random.default_rng(42)
    s = bytes(
        np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, 300_000)]
    )
    k_j, c_j = canonical_count_bytes(s, CountConfig(K=31, use_pallas=False))
    k_p, c_p = canonical_count_bytes(s, CountConfig(K=31, use_pallas=True))
    ok = np.array_equal(k_j, k_p) and np.array_equal(c_j, c_p)
    print("pallas == jnp counting parity:", ok)
    if not ok:
        sys.exit(1)

    from kmers_tpu.pipelines import minhash_sketch

    sk = minhash_sketch(s.replace(b"N", b"A"), K=16, s=100)
    print("minhash sketch size:", sk.size)

    t0 = time.perf_counter()
    k, c = canonical_count_bytes(s, CountConfig(K=31))
    dt = time.perf_counter() - t0
    print(f"300k bases counted in {dt*1e3:.0f} ms, {len(k)} distinct")
    print("OK")


if __name__ == "__main__":
    main()

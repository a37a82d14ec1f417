"""Batched TPU measurements for the counting-sort redesign (round 2).

Measures the current pipeline stage budget and the candidate sort
primitives at 2^26 elements on the real chip.  One script, one run —
remote compiles are 30-90 s each, so everything is batched.
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 26
REPS = 3


def timeit(name, fn, *args):
    def force(o):
        # fetch ONE element per output (a full fetch through the remote
        # transport would dwarf the kernel time)
        jax.tree.map(
            lambda x: np.asarray(x[..., :1] if x.ndim else x), o
        )

    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        force(o)
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 1)}), flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    hi = jax.device_put(rng.integers(0, 1 << 30, N, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, N, np.uint32))
    data = jax.device_put(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, N)]
    )
    results = {}

    from kmers_tpu.pipelines.canonical_count import _chunk_canonical, _chunk_count
    from kmers_tpu.ops.pallas.window_kernel import (
        canonical_windows_bytes_pallas,
        canonical_hash_bytes_pallas,
    )
    from kmers_tpu.ops.count import sort_count, _run_length_encode

    results["chunk_count_pallas"] = timeit(
        "chunk_count_pallas", partial(_chunk_count, K=31, use_pallas=True), data
    )
    results["frontend_masked"] = timeit(
        "frontend_masked_pallas",
        partial(_chunk_canonical, K=31, use_pallas=True),
        data,
    )
    results["frontend_bytes_fused"] = timeit(
        "frontend_bytes_fused",
        jax.jit(lambda d: canonical_windows_bytes_pallas(d, 31)),
        data,
    )
    results["frontend_hash_fused"] = timeit(
        "frontend_hash_fused",
        jax.jit(lambda d: canonical_hash_bytes_pallas(d, 31)),
        data,
    )

    # sort candidates
    results["sort_2key_2op"] = timeit(
        "sort_2key_2op",
        jax.jit(lambda a, b: lax.sort((a, b), num_keys=2, is_stable=False)),
        hi,
        lo,
    )
    results["sort_1key_1op"] = timeit(
        "sort_1key_1op",
        jax.jit(lambda a: lax.sort((a,), num_keys=1, is_stable=False)),
        lo,
    )
    results["sort_1key_2op"] = timeit(
        "sort_1key_2op",
        jax.jit(lambda a, b: lax.sort((a, b), num_keys=1, is_stable=False)),
        hi,
        lo,
    )
    hi2 = hi.reshape(256, -1)
    lo2 = lo.reshape(256, -1)
    results["sort_2key_batched_256x218"] = timeit(
        "sort_2key_batched_256x2^18",
        jax.jit(
            lambda a, b: lax.sort((a, b), dimension=1, num_keys=2, is_stable=False)
        ),
        hi2,
        lo2,
    )
    hi3 = hi.reshape(1024, -1)
    lo3 = lo.reshape(1024, -1)
    results["sort_2key_batched_1024x216"] = timeit(
        "sort_2key_batched_1024x2^16",
        jax.jit(
            lambda a, b: lax.sort((a, b), dimension=1, num_keys=2, is_stable=False)
        ),
        hi3,
        lo3,
    )

    # RLE alone (on pre-sorted input, content irrelevant for timing)
    results["rle_jnp"] = timeit(
        "rle_jnp", jax.jit(lambda a, b: _run_length_encode(a, b)), hi, lo
    )
    from kmers_tpu.ops.pallas.rle_kernel import rle_unit_pallas

    results["rle_pallas"] = timeit(
        "rle_pallas", jax.jit(lambda a, b: rle_unit_pallas(a, b)), hi, lo
    )

    # one global bitonic compare-exchange pass at large distance (est. of
    # per-pass cost for a hand-rolled merge phase)
    @jax.jit
    def ce_pass(a, b):
        d = N // 4
        a2 = a.reshape(-1, 2, d)
        b2 = b.reshape(-1, 2, d)
        le = (a2[:, 0] < a2[:, 1]) | ((a2[:, 0] == a2[:, 1]) & (b2[:, 0] <= b2[:, 1]))
        ah = jnp.where(le, a2[:, 0], a2[:, 1])
        al = jnp.where(le, a2[:, 1], a2[:, 0])
        bh = jnp.where(le, b2[:, 0], b2[:, 1])
        bl = jnp.where(le, b2[:, 1], b2[:, 0])
        return (
            jnp.stack([ah, al], 1).reshape(-1),
            jnp.stack([bh, bl], 1).reshape(-1),
        )

    results["ce_pass_global"] = timeit("ce_pass_global", ce_pass, hi, lo)

    # 256-bin histogram of the top byte via compare+reduce (radix pass A)
    @jax.jit
    def hist256(a):
        byte = (a >> 24).astype(jnp.int32).reshape(-1, 1)
        bins = jnp.arange(256, dtype=jnp.int32).reshape(1, -1)
        return jnp.sum((byte.reshape(-1, 512, 1) == bins[None]), axis=(0, 1))

    results["hist256_compare"] = timeit("hist256_compare", hist256, hi)

    with open("/root/repo/SORT_EXPERIMENTS_r02.json", "w") as f:
        json.dump({k: round(v * 1e3, 1) for k, v in results.items()}, f, indent=1)
    print("done")


if __name__ == "__main__":
    main()

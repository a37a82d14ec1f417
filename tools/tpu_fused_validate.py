"""Validate the fused-bytes kernels on the real chip: bit-exactness of the
default TPU counting/minhash paths vs the jnp paths, then headline timing."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    from kmers_tpu.pipelines.canonical_count import _chunk_count
    from kmers_tpu.pipelines.minhash import minhash_sketch

    rng = np.random.default_rng(5)
    out = {}

    # parity: mixed ACGT + N at 2^22
    L = 1 << 22
    data = np.frombuffer(b"ACGTN", dtype=np.uint8)[
        rng.integers(0, 5, L) % np.array([4, 4, 4, 4, 5]).max() % 5
    ]
    data = np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, L)]
    d = jax.device_put(data)
    res = {}
    for up in (False, True):
        uh, ul, cnt, nu, n_inv, n_amb = _chunk_count(d, 31, up)
        cnt = np.asarray(cnt)
        uh, ul = np.asarray(uh), np.asarray(ul)
        keep = cnt > 0
        k = (uh[keep].astype(np.uint64) << np.uint64(32)) | ul[keep].astype(
            np.uint64
        )
        res[up] = (k, cnt[keep], int(nu), int(n_amb))
    ok = (
        np.array_equal(res[False][0], res[True][0])
        and np.array_equal(res[False][1], res[True][1])
        and res[False][2] == res[True][2]
        and res[False][3] == res[True][3]
    )
    out["count_parity_jnp_vs_fused"] = bool(ok)
    out["n_unique"] = res[True][2]

    s_jnp = minhash_sketch(bytes(data), K=16, s=1000, use_pallas=False)
    s_pal = minhash_sketch(bytes(data), K=16, s=1000, use_pallas=True)
    out["minhash_parity"] = bool(np.array_equal(s_jnp, s_pal))

    # headline timing at 2^26 (bench.py protocol)
    L = 1 << 26
    big = jax.device_put(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    )
    o = _chunk_count(big, 31, True)
    int(np.asarray(o[3]))
    reps = 4
    t0 = time.perf_counter()
    outs = [_chunk_count(big, 31, True) for _ in range(reps)]
    for o in outs:
        int(np.asarray(o[3]))
    dt = (time.perf_counter() - t0) / reps
    out["bench_bases_per_sec"] = round(L / dt)
    out["bench_vs_baseline"] = round(L / dt / 5e7, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

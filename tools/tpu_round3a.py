"""Round-3 batch A: re-probe the gather/scatter door on the current
toolchain (the radix-sort prerequisite NOTES_R3.md flags for retest),
plus fresh 2^24 reference timings for the flagship stages.

Prints one JSON line per experiment, flushed, so a late crash cannot
lose earlier results.  Run under `timeout`.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=4):
    """Timing with an in-jit scalar fold so only a scalar crosses the
    tunnel (np.asarray of a big output costs seconds of host transfer)."""
    import functools

    @jax.jit
    def folded(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.zeros((), jnp.uint32)
        for l in leaves:
            acc = acc + l.ravel()[-1].astype(jnp.uint32) + l.ravel()[0].astype(jnp.uint32)
        return acc

    int(np.asarray(folded(*args)))  # compile + warmup
    t0 = time.perf_counter()
    outs = [folded(*args) for _ in range(reps)]
    for o in outs:
        int(np.asarray(o))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jaxlib

    emit(jax=jax.__version__, jaxlib=jaxlib.__version__,
         backend=jax.default_backend(),
         device=str(jax.devices()[0]))

    rng = np.random.default_rng(7)
    N = 1 << 24

    hi = jax.device_put(rng.integers(0, 1 << 30, N, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, N, np.uint32))

    # --- reference: current sort costs at 2^24 ---
    s2 = (lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    emit(sort_2op_2_24_ms=round(bench(s2, hi, lo), 1))
    s1 = (lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False)[0])
    emit(sort_1op_2_24_ms=round(bench(s1, lo), 1))

    # --- XLA gather: permutation take_along_axis, u32 ---
    perm = jax.device_put(rng.permutation(N).astype(np.int32))
    g = (lambda x, i: jnp.take_along_axis(x, i, axis=0))
    emit(gather_perm_2_24_ms=round(bench(g, lo, perm), 1))

    # gather with radix-like locality: indices = stable argsort of a
    # random 8-bit digit (256 increasing streams)
    dig = rng.integers(0, 256, N, np.uint8)
    ridx = jax.device_put(np.argsort(dig, kind="stable").astype(np.int32))
    emit(gather_radix_2_24_ms=round(bench(g, lo, ridx), 1))

    # --- XLA scatter of a permutation (unique indices) ---
    def scat(x, i):
        return jnp.zeros_like(x).at[i].set(x, unique_indices=True)

    sc = scat
    emit(scatter_perm_2_24_ms=round(bench(sc, lo, perm), 1))
    emit(scatter_radix_2_24_ms=round(bench(sc, lo, ridx), 1))

    # --- scatter-add histogram (fixed-table door): 2^16 buckets ---
    h16 = jax.device_put((rng.integers(0, 1 << 32, N) >> 16).astype(np.int32))

    def hist(i):
        return jnp.zeros(1 << 16, jnp.int32).at[i].add(1)

    emit(scatter_add_hist64k_2_24_ms=round(bench(hist, h16), 1))

    emit(done="batch_a")


if __name__ == "__main__":
    main()

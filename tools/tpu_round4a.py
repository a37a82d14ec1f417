"""Round-4 batch A: sort-dtype and dispatch-layout experiments.

Round-3 closed gather/scatter/radix doors; the remaining measured fact is
that sort cost scales with OPERAND COUNT (u32 1-op 27 ms, u32 2-op 31 ms
at 2^24).  The canonical K<=31 key is 62 bits — it fits in ONE uint64
operand.  This batch measures (all pure-XLA ops, no Mosaic probes):

  1. baseline standalone 2-key u32 sort @ 2^24
  2. single-operand u64 sort @ 2^24
  3. combine (hi,lo)->u64 and split u64->(hi,lo) elementwise costs
  4. batched-row sorts (lower comparator depth per row): 2-key u32 and
     1-key u64 over (4|16|64) rows
  5. end-to-end pipeline variants: fused flagship vs split dispatch vs
     barrier vs the u64-sort sandwich (FE dispatch -> x64 sort dispatch
     -> pallas RLE dispatch)

x64 note: global jax_enable_x64 breaks Mosaic lowering on this toolchain
(reductions re-trace to i64 inside kernels), so u64 work runs inside the
scoped ``jax.enable_x64(True)`` context in its own dispatch while the
Pallas FE/RLE dispatches stay non-x64.

Run under `timeout` on the TPU; prints one JSON line per measurement.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(step, fetch, reps=8):
    out = step()
    fetch(out)
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from kmers_tpu.ops.count import sort_count
    from kmers_tpu.ops.pallas.rle_kernel import rle_unit_pallas
    from kmers_tpu.ops.pallas.window_kernel import (
        canonical_windows_u32_pallas,
    )
    from kmers_tpu.pipelines.canonical_count import (
        _chunk_count_u32,
        _pad_to_u32_view,
        _V_U32,
    )

    K = 31
    L = 1 << 24
    rng = np.random.default_rng(0)
    data = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
    v, _ = _pad_to_u32_view(data)
    arg = jax.device_put(v)

    # raw (hi, lo) streams for the standalone sorts
    fe = jax.jit(lambda a: canonical_windows_u32_pallas(a, K, V=_V_U32))
    hi, lo, _, _ = fe(arg)
    hi = jax.device_put(np.asarray(hi))
    lo = jax.device_put(np.asarray(lo))
    n = hi.shape[0]
    emit(n=n, backend=jax.default_backend())

    def scalarize(*arrs):
        return sum(a.reshape(-1)[0].astype(jnp.int32) for a in arrs)

    # --- 1. baseline: 2-key u32 sort
    @jax.jit
    def s_2op(h, l):
        sh, sl = lax.sort((h, l), num_keys=2, is_stable=False)
        return sh, sl, scalarize(sh, sl)

    emit(sort2_u32_ms=round(timed(
        lambda: s_2op(hi, lo), lambda o: int(np.asarray(o[-1]))), 1))

    # --- 2. single-operand u64 sort (scoped x64)
    with jax.enable_x64(True):
        x64 = (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(
            jnp.uint64)
        x64 = jax.device_put(np.asarray(x64))

        @jax.jit
        def s_1op_u64(x):
            s = lax.sort((x,), num_keys=1, is_stable=False)[0]
            return s, s.reshape(-1)[0].astype(jnp.int32)

        emit(sort1_u64_ms=round(timed(
            lambda: s_1op_u64(x64), lambda o: int(np.asarray(o[-1]))), 1))

        # --- 3. combine / split elementwise costs
        @jax.jit
        def comb(h, l):
            x = (h.astype(jnp.uint64) << np.uint64(32)) | l.astype(
                jnp.uint64)
            return x, x.reshape(-1)[0].astype(jnp.int32)

        emit(combine_ms=round(timed(
            lambda: comb(hi, lo), lambda o: int(np.asarray(o[-1]))), 1))

        @jax.jit
        def split(x):
            h = (x >> np.uint64(32)).astype(jnp.uint32)
            l = x.astype(jnp.uint32)
            return h, l, scalarize(h, l)

        emit(split_ms=round(timed(
            lambda: split(x64), lambda o: int(np.asarray(o[-1]))), 1))

        # fused combine+sort+split, one x64 dispatch
        @jax.jit
        def css(h, l):
            x = (h.astype(jnp.uint64) << np.uint64(32)) | l.astype(
                jnp.uint64)
            s = lax.sort((x,), num_keys=1, is_stable=False)[0]
            sh = (s >> np.uint64(32)).astype(jnp.uint32)
            sl = s.astype(jnp.uint32)
            return sh, sl, scalarize(sh, sl)

        emit(combine_sort_split_ms=round(timed(
            lambda: css(hi, lo), lambda o: int(np.asarray(o[-1]))), 1))

    # --- 4. batched-row sorts
    for rows in (4, 16, 64):
        cols = n // rows
        hb = jax.device_put(np.asarray(hi).reshape(rows, cols))
        lb = jax.device_put(np.asarray(lo).reshape(rows, cols))

        @jax.jit
        def sb2(h, l):
            sh, sl = lax.sort((h, l), num_keys=2, is_stable=False,
                              dimension=1)
            return sh, sl, scalarize(sh, sl)

        emit(**{f"sortB{rows}_u32_ms": round(timed(
            lambda: sb2(hb, lb), lambda o: int(np.asarray(o[-1]))), 1)})

        with jax.enable_x64(True):
            xb = jax.device_put(np.asarray(x64).reshape(rows, cols))

            @jax.jit
            def sb1(x):
                s = lax.sort((x,), num_keys=1, is_stable=False,
                             dimension=1)[0]
                return s, s.reshape(-1)[0].astype(jnp.int32)

            emit(**{f"sortB{rows}_u64_ms": round(timed(
                lambda: sb1(xb), lambda o: int(np.asarray(o[-1]))), 1)})

    # --- 5. end-to-end variants
    fetch3 = lambda o: int(np.asarray(o[3]))  # noqa: E731
    emit(flagship_ms=round(timed(
        lambda: _chunk_count_u32(arg, K), fetch3, reps=16), 1))

    @jax.jit
    def count_only(h, l):
        return sort_count(h, l, None, use_pallas=True)

    def split_step():
        h, l, nb, na = fe(arg)
        return count_only(h, l)

    emit(split_dispatch_ms=round(timed(split_step, fetch3, reps=16), 1))

    @jax.jit
    def barrier_step(a):
        h, l, nb, na = canonical_windows_u32_pallas(a, K, V=_V_U32)
        h, l = jax.lax.optimization_barrier((h, l))
        return sort_count(h, l, None, use_pallas=True)

    emit(barrier_ms=round(timed(
        lambda: barrier_step(arg), fetch3, reps=16), 1))

    # u64 sandwich: FE (pallas) | combine+sort+split (x64) | RLE (pallas)
    with jax.enable_x64(True):

        @jax.jit
        def css2(h, l):
            x = (h.astype(jnp.uint64) << np.uint64(32)) | l.astype(
                jnp.uint64)
            s = lax.sort((x,), num_keys=1, is_stable=False)[0]
            return (s >> np.uint64(32)).astype(jnp.uint32), s.astype(
                jnp.uint32)

    rle = jax.jit(rle_unit_pallas)

    def sandwich():
        h, l, nb, na = fe(arg)
        with jax.enable_x64(True):
            sh, sl = css2(h, l)
        return rle(sh, sl)

    emit(pipe_u64_sandwich_ms=round(timed(sandwich, fetch3, reps=16), 1))

    # parity check of the u64 sandwich against the flagship
    a_out = _chunk_count_u32(arg, K)
    b_out = sandwich()

    def table(o):
        uh, ul, cnt = (np.asarray(x) for x in o[:3])
        keep = cnt > 0
        km = (uh.astype(np.uint64) << np.uint64(32)) | ul.astype(np.uint64)
        km, c = km[keep], cnt[keep]
        order = np.argsort(km)
        return km[order], c[order]

    ka, ca = table(a_out)
    kb, cb = table(b_out)
    emit(u64_pipeline_parity=bool(
        np.array_equal(ka, kb) and np.array_equal(ca, cb)))

    emit(done="round4a")


if __name__ == "__main__":
    main()

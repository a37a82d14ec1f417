"""Round-4 batch B: the custom-sort showdown (run on a HEALTHY chip).

Order matters: calibration first (detects a degraded chip/tunnel — abort
if the flagship is far off its known ~41 ms), tiny-compile probes next,
the big unrolled local-sort kernel LAST (longest compile; if Mosaic
chokes, nothing else is lost).  Run under `timeout`.

Measurements:
  1. calibration: flagship _chunk_count_u32 @ 2^24 (known-good 41 ms)
  2. standalone lax.sort 2-key u32 @ 2^24 (known-good 30.6 ms)
  3. merge-tail kernel: 15 fused CE stages in one pass @ 2^24
     -> per-stage rate vs XLA's effective ~102 us/stage
  4. split dispatch FE | sort+RLE
  5. full bitonic_sort_pallas @ 2^24 vs lax.sort (parity + time)
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
    fetch3 = lambda o: int(np.asarray(o[3]))  # noqa: E731
    fetch_scalar = lambda o: int(np.asarray(o[-1]))  # noqa: E731

    # --- 1. calibration
    flagship = timed(lambda: _chunk_count_u32(arg, K), fetch3, reps=16)
    emit(flagship_ms=round(flagship, 1), healthy=flagship < 80)
    if flagship > 120:
        emit(abort="chip/tunnel degraded; rerun when healthy")
        return

    fe = jax.jit(lambda a: canonical_windows_u32_pallas(a, K, V=_V_U32))
    hi, lo, _, _ = fe(arg)
    hi = jax.device_put(np.asarray(hi))
    lo = jax.device_put(np.asarray(lo))
    n = hi.shape[0]
    emit(n=n)

    # --- 2. baseline sort
    @jax.jit
    def s_2op(h, l):
        sh, sl = lax.sort((h, l), num_keys=2, is_stable=False)
        return sh, sl, (sh[0] + sl[0]).astype(jnp.int32)

    sort_ms = timed(lambda: s_2op(hi, lo), fetch_scalar)
    emit(sort2_u32_ms=round(sort_ms, 1),
         xla_us_per_stage=round(sort_ms * 1e3 / 300, 1))

    # --- 3. merge-tail kernel: 15 CE stages in one pass
    from kmers_tpu.ops.pallas.merge_kernel import bitonic_merge_tail_pallas

    cnt = jax.device_put(np.ones(n, np.int32))

    @jax.jit
    def tail(h, l, c):
        oh, ol, oc = bitonic_merge_tail_pallas(h, l, c)
        return oh, ol, oc, (oh[0] + ol[0]).astype(jnp.int32)

    tail_ms = timed(lambda: tail(hi, lo, cnt), fetch_scalar)
    emit(merge_tail15_3op_ms=round(tail_ms, 1),
         pallas_us_per_stage_3op=round(tail_ms * 1e3 / 15, 1))

    # --- 4. split dispatch
    @jax.jit
    def count_only(h, l):
        return sort_count(h, l, None, use_pallas=True, key_bits=2 * K)

    def split_step():
        h, l, nb, na = fe(arg)
        return count_only(h, l)

    emit(split_dispatch_ms=round(timed(split_step, fetch3, reps=16), 1))

    @jax.jit
    def barrier_step(a):
        h, l, nb, na = canonical_windows_u32_pallas(a, K, V=_V_U32)
        h, l = jax.lax.optimization_barrier((h, l))
        return sort_count(h, l, None, use_pallas=True, key_bits=2 * K)

    emit(barrier_ms=round(timed(
        lambda: barrier_step(arg), fetch3, reps=16), 1))

    # --- 5. full custom sort (biggest compile LAST)
    from kmers_tpu.ops.pallas.sort_kernel import (
        bitonic_local_sort_pallas,
        bitonic_sort_pallas,
    )

    @jax.jit
    def local_sort(h, l):
        oh, ol = bitonic_local_sort_pallas(h, l)
        return oh, ol, (oh[0] + ol[0]).astype(jnp.int32)

    t0 = time.perf_counter()
    out = local_sort(hi, lo)
    fetch_scalar(out)
    emit(local_sort_compile_s=round(time.perf_counter() - t0, 1))
    local_ms = timed(lambda: local_sort(hi, lo), fetch_scalar)
    emit(local_sort120_ms=round(local_ms, 1),
         pallas_us_per_stage_2op=round(local_ms * 1e3 / 120, 1))

    @jax.jit
    def full_sort(h, l):
        oh, ol = bitonic_sort_pallas(h, l)
        return oh, ol, (oh[0] + ol[0]).astype(jnp.int32)

    t0 = time.perf_counter()
    out = full_sort(hi, lo)
    fetch_scalar(out)
    emit(full_sort_compile_s=round(time.perf_counter() - t0, 1))
    # parity vs lax.sort
    ref = s_2op(hi, lo)
    ok = bool(
        np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        and np.array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    )
    emit(full_sort_parity=ok)
    emit(bitonic_sort_pallas_ms=round(
        timed(lambda: full_sort(hi, lo), fetch_scalar), 1))

    emit(done="round4b")


if __name__ == "__main__":
    main()

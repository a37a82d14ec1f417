"""Round-3 batch E: last two sort-representation probes (u16 4-op,
complex64 1-op lexicographic) + flagship wall timing at reps=16 for
bench.py calibration.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed(step, reps, fetch):
    out = step()
    fetch(out)
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        fetch(o)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(7)
    N = 1 << 24
    hi = jax.device_put(rng.integers(0, 1 << 30, N, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, N, np.uint32))

    fetch0 = lambda o: int(np.asarray(o))  # noqa: E731

    # baseline again for variance context
    @jax.jit
    def s2(a, b):
        x, y = jax.lax.sort((a, b), num_keys=2, is_stable=False)
        return (x[-1] + y[-1]).astype(jnp.uint32)

    emit(sort_2op_ms=round(timed(lambda: s2(hi, lo), 8, fetch0), 1))

    # u16 x4 operands, num_keys=4
    a = jax.device_put((np.asarray(hi) >> 16).astype(np.uint16))
    b = jax.device_put((np.asarray(hi) & 0xFFFF).astype(np.uint16))
    c = jax.device_put((np.asarray(lo) >> 16).astype(np.uint16))
    d = jax.device_put((np.asarray(lo) & 0xFFFF).astype(np.uint16))

    @jax.jit
    def s4(a, b, c, d):
        w, x, y, z = jax.lax.sort((a, b, c, d), num_keys=4, is_stable=False)
        return (w[-1] + x[-1] + y[-1] + z[-1]).astype(jnp.uint16)

    try:
        emit(sort_4op_u16_ms=round(timed(lambda: s4(a, b, c, d), 4, fetch0), 1))
    except Exception as e:  # noqa: BLE001
        emit(sort_4op_u16="fail", err=str(e)[:120])

    emit(sort_1op_c64="skip", reason="complex64 device_put UNIMPLEMENTED on axon backend")

    # flagship wall per chunk at reps=16 (bench calibration)
    from kmers_tpu.pipelines.canonical_count import (
        _chunk_count_u32,
        _pad_to_u32_view,
    )

    data = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, N)]
    v, _ = _pad_to_u32_view(data)
    arg = jax.device_put(v)
    step = lambda: _chunk_count_u32(arg, 31)  # noqa: E731
    fetch = lambda o: int(np.asarray(o[3]))  # noqa: E731
    emit(flagship_ms_reps16=round(timed(step, 16, fetch), 1))
    emit(flagship_ms_reps4=round(timed(step, 4, fetch), 1))

    emit(done="batch_e")


if __name__ == "__main__":
    main()

"""Round-2 batch C: flat-chunk profile, u64 1-op sort, dynamic_gather
probe, finer batched sorts, kernel W variants."""

import collections
import glob
import gzip
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
        jax.tree.map(lambda x: np.asarray(x[..., :1] if x.ndim else x), o)

    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    for o in outs:
        force(o)
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({"name": name, "ms": round(dt * 1e3, 1)}), flush=True)
    return dt


def profile_top(fn, tag, n=12):
    import shutil

    d = f"/tmp/tb_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    fn()
    jax.profiler.start_trace(d)
    fn()
    jax.profiler.stop_trace()
    tr = sorted(glob.glob(f"{d}/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr) as f:
        t = json.load(f)
    durs = collections.Counter()
    pid_dev = None
    for e in t["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e["args"].get("name")):
                pid_dev = e["pid"]
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") == pid_dev:
            durs[e.get("name", "?")] += e["dur"]
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[:n]:
        print(f"PROF[{tag}] {dur/1e3:9.2f} ms  {name[:100]}", flush=True)


def main():
    from kmers_tpu.pipelines.canonical_count import _chunk_count

    rng = np.random.default_rng(0)
    data = jax.device_put(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, N)]
    )
    hi = jax.device_put(rng.integers(0, 1 << 30, N, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, N, np.uint32))

    # 1. profile the flat chunk
    def run_chunk():
        out = _chunk_count(data, 31, True)
        int(np.asarray(out[3]))

    profile_top(run_chunk, "flatchunk")

    # 2. u64 1-op sort
    with jax.enable_x64(True):
        @jax.jit
        def s64(a, b):
            v = (a.astype(jnp.uint64) << np.uint64(32)) | b.astype(jnp.uint64)
            s = lax.sort((v,), num_keys=1, is_stable=False)[0]
            return (s >> np.uint64(32)).astype(jnp.uint32), s.astype(jnp.uint32)

        timeit("sort_u64_1op_incl_packing", s64, hi, lo)

    # 3. finer batched
    for rows in (65536, 262144):
        h2, l2 = hi.reshape(rows, -1), lo.reshape(rows, -1)
        timeit(
            f"sort_2key_batched_{rows}x{N // rows}",
            jax.jit(
                lambda a, b: lax.sort((a, b), dimension=1, num_keys=2, is_stable=False)
            ),
            h2,
            l2,
        )

    # 4. dynamic_gather probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, L128 = 512, 128

    def gkern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def gather_cols(x, idx):
        return pl.pallas_call(
            gkern,
            grid=(x.shape[0] // S,),
            in_specs=[
                pl.BlockSpec((S, L128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, L128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, L128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x, idx)

    M = N // L128
    x = jax.device_put(rng.integers(0, 1 << 31, (M, L128), np.int32))
    base = np.broadcast_to(
        np.arange(S, dtype=np.int32)[:, None], (S, L128)
    )
    idx = jax.device_put(np.tile(base[::-1], (M // S, 1)))  # reverse perm
    try:
        out = gather_cols(x, idx)
        o0 = np.asarray(out[:S])
        ok = np.array_equal(o0, np.asarray(x[:S])[::-1])
        print(json.dumps({"dynamic_gather_axis0_ok": bool(ok)}), flush=True)
        timeit("dynamic_gather_axis0_full", gather_cols, x, idx)
    except Exception as e:
        print(json.dumps({"dynamic_gather_axis0_error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()

"""Round-2 batch B: new fused chunk timing/profile + sort variants +
dynamic_gather feasibility."""

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


def main():
    from kmers_tpu.pipelines.canonical_count import _chunk_count

    rng = np.random.default_rng(0)
    data = jax.device_put(
        np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, N)]
    )
    hi = jax.device_put(rng.integers(0, 1 << 30, N, np.uint32))
    lo = jax.device_put(rng.integers(0, 1 << 32, N, np.uint32))

    # 0. parity of the new flat path vs jnp path at 2^22 first
    small = jax.device_put(
        np.frombuffer(b"ACGTN", dtype=np.uint8)[
            np.random.default_rng(5).integers(0, 5, 1 << 22)
        ]
    )
    res = {}
    for up in (False, True):
        uh, ul, cnt, nu, n_inv, n_amb = _chunk_count(small, 31, up)
        cnt = np.asarray(cnt)
        keep = cnt > 0
        k = (np.asarray(uh)[keep].astype(np.uint64) << np.uint64(32)) | np.asarray(ul)[
            keep
        ].astype(np.uint64)
        res[up] = (np.sort(k), cnt[keep].sum(), int(nu), int(n_inv), int(n_amb))
    ok = (
        np.array_equal(res[False][0], res[True][0])
        and res[False][1] == res[True][1]
        and res[False][2:] == res[True][2:]
    )
    print(json.dumps({"flat_path_parity": bool(ok), "meta": [int(res[True][1]), res[True][2], res[True][3], res[True][4]]}), flush=True)

    timeit("chunk_count_flat", partial(_chunk_count, K=31, use_pallas=True), data)

    # batched finer rows
    for shape in ((4096, N // 4096), (16384, N // 16384)):
        h2, l2 = hi.reshape(shape), lo.reshape(shape)
        timeit(
            f"sort_2key_batched_{shape[0]}x{shape[1]}",
            jax.jit(
                lambda a, b: lax.sort((a, b), dimension=1, num_keys=2, is_stable=False)
            ),
            h2,
            l2,
        )

    # u64 single-operand sort (x64 only inside this probe)
    with jax.experimental.enable_x64():
        v = (hi.astype(jnp.uint64) << np.uint64(32)) | lo.astype(jnp.uint64)
        timeit(
            "sort_u64_1op",
            jax.jit(lambda a: lax.sort((a,), num_keys=1, is_stable=False)),
            v,
        )

    # dynamic_gather micro-kernel: per-column gather along sublanes
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

    M = N // L128  # rows so that total = N elements
    x = jax.device_put(rng.integers(0, 1 << 31, (M, L128), np.int32))
    idx = jax.device_put(
        rng.permuted(
            np.broadcast_to(np.arange(S, dtype=np.int32)[:, None], (M, L128)).reshape(
                M // S, S, L128
            ),
            axis=1,
        ).reshape(M, L128)
    )
    try:
        out = gather_cols(x, idx)
        xs = np.asarray(x[:S]);  i0 = np.asarray(idx[:S]); o0 = np.asarray(out[:S])
        ok = np.array_equal(o0, np.take_along_axis(xs, i0, axis=0))
        print(json.dumps({"dynamic_gather_axis0_ok": bool(ok)}), flush=True)
        timeit("dynamic_gather_axis0_full", gather_cols, x, idx)
    except Exception as e:
        print(json.dumps({"dynamic_gather_axis0_error": repr(e)[:300]}), flush=True)

    # profile the new chunk
    out = _chunk_count(data, 31, True)
    int(np.asarray(out[3]))
    jax.profiler.start_trace("/tmp/tb_chunk2")
    out = _chunk_count(data, 31, True)
    int(np.asarray(out[3]))
    jax.profiler.stop_trace()
    tr = sorted(glob.glob("/tmp/tb_chunk2/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(tr) as f:
        t = json.load(f)
    durs = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") == 3:
            durs[e.get("name", "?")] += e["dur"]
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:12]:
        print(f"PROF {d/1e3:9.2f} ms  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()

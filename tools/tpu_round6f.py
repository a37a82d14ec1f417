"""Round-6 batch F.

1. merge_sorted_counts (concat + unstable sort + weighted RLE) vs
   merge_compact_tables (bitonic stage loop) at 2^24-row and 2^16-row
   table pairs — XLA fuses comparator stages inside its sort HLO
   (~0.2 ms/stage at 2^25) while the jnp bitonic loop materializes every
   stage (~12 ms/stage measured).
2. six-frame tail device-HLO profile (sort 2^25 expected ~60 ms; tail
   measures ~120).
3. fused sharded single-dispatch (BENCH_ALL sharded_count_1dev config)
   after the 1-D boundary refactor.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _probe_op():
    return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()


int(np.asarray(_probe_op()))
t0 = time.perf_counter()
int(np.asarray(_probe_op()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded")
    sys.exit(1)

rng = np.random.default_rng(0)

from kmers_tpu.ops.count import (  # noqa: E402
    SENTINEL,
    merge_compact_tables,
    merge_sorted_counts,
)


def mk_table(nrows, fill):
    # sorted-unique uint62 keys + sentinel tail padding
    n_real = int(nrows * fill)
    hi = rng.integers(0, 1 << 30, n_real, dtype=np.uint64)
    lo = rng.integers(0, 1 << 32, n_real, dtype=np.uint64)
    v = np.unique((hi << np.uint64(32)) | lo)
    n_real = v.size
    h = np.full(nrows, SENTINEL, np.uint32)
    l = np.full(nrows, SENTINEL, np.uint32)
    c = np.zeros(nrows, np.int32)
    h[:n_real] = (v >> np.uint64(32)).astype(np.uint32)
    l[:n_real] = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    c[:n_real] = 1 + (np.arange(n_real) % 5)
    return jax.device_put(h), jax.device_put(l), jax.device_put(c)


jm_sort = jax.jit(merge_sorted_counts)
jm_bit = jax.jit(merge_compact_tables)

for logn in (24, 20, 16):
    n = 1 << logn
    A = mk_table(n, 0.95)
    B = mk_table(n, 0.95)
    for name, fn in (("merge_sort", jm_sort), ("merge_bitonic", jm_bit)):
        out = fn(*A, *B)
        np.asarray(out[3]).reshape(-1)[()]
        reps = 4 if logn >= 24 else 16
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*A, *B)
            np.asarray(out[3]).reshape(-1)[()]
        emit(
            config=f"{name}_2^{logn}",
            ms=round((time.perf_counter() - t0) / reps * 1e3, 2),
        )

# parity spot check
A = mk_table(1 << 14, 0.9)
B = mk_table(1 << 14, 0.9)
o1 = jm_sort(*A, *B)
o2 = jm_bit(*A, *B)
k1 = (np.asarray(o1[0]).astype(np.uint64) << np.uint64(32)) | np.asarray(o1[1])
k2 = (np.asarray(o2[0]).astype(np.uint64) << np.uint64(32)) | np.asarray(o2[1])
c1, c2 = np.asarray(o1[2]), np.asarray(o2[2])
d1 = dict(zip(k1[c1 > 0].tolist(), c1[c1 > 0].tolist()))
d2 = dict(zip(k2[c2 > 0].tolist(), c2[c2 > 0].tolist()))
emit(config="merge_parity", ok=bool(d1 == d2), n=len(d1))

# ---- 2. six-frame tail profile ----
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kmers_tpu.parallel import data_mesh  # noqa: E402
from kmers_tpu.parallel.sixframe import (  # noqa: E402
    SixFrameCountConfig,
    _sixframe_fe_step,
    _sixframe_tail_step,
)
from kmers_tpu.utils.profiling import profile_step  # noqa: E402

mesh = data_mesh(1)
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 24)]
cfg = SixFrameCountConfig(K=7)
L6 = 1 << 24
H6 = 3 * cfg.K
shard6 = L6 + ((-L6) % 3)
padded6 = np.zeros(shard6 + H6, np.uint8)
padded6[:L6] = acgt[:L6]
shards6 = np.zeros((1, shard6 + 2 * H6), np.uint8)
shards6[0, H6 : H6 + shard6 + H6] = padded6
tbl_bytes = bytes(np.asarray(cfg.code.tbl).tobytes())
arg6 = jax.device_put(shards6, sharding)
pad36 = np.zeros(1, np.int32)
fe = _sixframe_fe_step(mesh, cfg.K, tbl_bytes)
tail = _sixframe_tail_step(mesh, cfg.K, False, False)
hi6, lo6, _nv = fe(arg6, pad36)
np.asarray(_nv).reshape(-1)[0]


def tail_force():
    out = tail(hi6, lo6)
    np.asarray(out[3]).reshape(-1)[0]


tail_force()
top = profile_step(tail_force, reps=2, top=12)
emit(config="sixframe_tail_profile", top=[[n, round(ms, 2)] for n, ms in top])

# ---- 3. fused sharded single dispatch (1 chunk per device) ----
from kmers_tpu.parallel.pipeline import (  # noqa: E402
    _pick_v,
    _rows_to_u32_view,
    _shard_with_halo,
    sharded_count_step,
)

K = 31
shards, shard = _shard_with_halo(acgt.copy(), 1, K, pad_byte=ord("N"))
cap = int(np.ceil(shard * 2.0))
V = _pick_v(shards.shape[1])
stepf = sharded_count_step(mesh, K, shard, cap, True, False, V)
view = _rows_to_u32_view(shards, V)
argS = jax.device_put(view, sharding)
out = stepf(argS)
np.asarray(out[3]).reshape(-1)[0]
t0 = time.perf_counter()
outs = [stepf(argS) for _ in range(16)]
for o in outs:
    np.asarray(o[3]).reshape(-1)[0]
dt = (time.perf_counter() - t0) / 16
emit(
    config="sharded_count_1dev_fused",
    ms=round(dt * 1e3, 2),
    mbases_s=round((1 << 24) / dt / 1e6, 1),
)

emit(done="round6f")

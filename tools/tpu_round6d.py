"""Round-6 batch D: device-time profiles for the two remaining gaps.

1. six-frame FE (step-3 form): where do the non-sort ~80 ms/2^24 go?
2. streamed sharded path: count/compact/merge each timed in isolation
   with blocking fetches (round6c's aggregate said ~520 ms/chunk hides
   somewhere between them).
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
K = 31
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 24)]

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kmers_tpu.parallel import data_mesh  # noqa: E402
from kmers_tpu.utils.profiling import profile_step  # noqa: E402

mesh = data_mesh(1)
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))

# ---- 1. six-frame FE profile ----
from kmers_tpu.parallel.sixframe import (  # noqa: E402
    SixFrameCountConfig,
    _sixframe_fe_step,
    _sixframe_tail_step,
)

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


def fe_force():
    hi, lo, nv = fe(arg6, pad36)
    np.asarray(nv).reshape(-1)[0]
    return hi, lo


hi, lo = fe_force()  # compile

t0 = time.perf_counter()
for _ in range(4):
    fe_force()
emit(config="sixframe_fe_wall", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))
top = profile_step(lambda: fe_force(), reps=2, top=12)
emit(config="sixframe_fe_profile", top=[[n, round(ms, 2)] for n, ms in top])


def tail_force():
    out = tail(hi, lo)
    np.asarray(out[3]).reshape(-1)[0]


tail_force()
t0 = time.perf_counter()
for _ in range(4):
    tail_force()
emit(config="sixframe_tail_wall", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))

# ---- 2. streamed component isolation ----
from kmers_tpu.ops.count import _next_pow2  # noqa: E402
from kmers_tpu.parallel.pipeline import (  # noqa: E402
    _compact_step,
    _local_count_step,
    _merge_step,
    _pick_v,
    _rows_to_u32_view,
)

V = _pick_v(1 << 24)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)

rows = acgt[None, :]
view = _rows_to_u32_view(np.ascontiguousarray(rows), V)
a = jax.device_put(view, sharding)

# count alone (blocking)
out = count(a)
np.asarray(out[3]).reshape(-1)[0]
t0 = time.perf_counter()
for _ in range(4):
    out = count(a)
    np.asarray(out[3]).reshape(-1)[0]
emit(config="stream_count_only", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))
uh, ul, cnt, nu, nb = out
emit(config="stream_count_nu", nu=int(np.asarray(nu).reshape(-1)[0]))

# compact alone
cu = compact(uh, ul, cnt)
np.asarray(cu[2]).reshape(-1)[0]
t0 = time.perf_counter()
for _ in range(4):
    cu = compact(uh, ul, cnt)
    np.asarray(cu[2]).reshape(-1)[0]
emit(config="stream_compact_only", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))

# slice to cap
cap = _next_pow2(max(int(np.asarray(nu).reshape(-1)[0]), 1))
sl = tuple(x[:, :cap] for x in cu[:3])
np.asarray(sl[2]).reshape(-1)[0]

# merge of two sliced tables (the level-stack step)
m = merge(*sl, *sl)
np.asarray(m[3]).reshape(-1)[0]
t0 = time.perf_counter()
for _ in range(4):
    m = merge(*sl, *sl)
    np.asarray(m[3]).reshape(-1)[0]
emit(
    config="stream_merge_only",
    ms=round((time.perf_counter() - t0) / 4 * 1e3, 1),
    rows=int(sl[0].shape[1]),
)
top = profile_step(
    lambda: (lambda mm: np.asarray(mm[3]).reshape(-1)[0])(merge(*sl, *sl)),
    reps=2,
    top=10,
)
emit(config="stream_merge_profile", top=[[n, round(ms, 2)] for n, ms in top])

emit(done="round6d")

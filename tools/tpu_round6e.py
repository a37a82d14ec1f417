"""Round-6 batch E: measure the 1-D table-boundary refactor.

ROUND6D found compact=1976 ms, merge=604 ms, sixframe tail=149 ms — all
shard_map programs whose (1, n) table boundaries forced the rank-2
(8, 128) tiled layout.  Tables now cross boundaries 1-D (P(axis)).
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

from kmers_tpu.ops.count import _next_pow2  # noqa: E402
from kmers_tpu.parallel import data_mesh  # noqa: E402
from kmers_tpu.parallel.pipeline import (  # noqa: E402
    _compact_step,
    _local_count_step,
    _merge_step,
    _pick_v,
    _rows_to_u32_view,
    _shard_with_halo,
)
from kmers_tpu.utils.levelstack import LevelStack  # noqa: E402

mesh = data_mesh(1)
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
V = _pick_v(1 << 24)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)

rows = acgt[None, :]
a = jax.device_put(_rows_to_u32_view(np.ascontiguousarray(rows), V), sharding)

# components in isolation (blocking)
out = count(a)
np.asarray(out[3]).reshape(-1)[0]
t0 = time.perf_counter()
for _ in range(4):
    out = count(a)
    np.asarray(out[3]).reshape(-1)[0]
emit(config="stream_count_only", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))
uh, ul, cnt, nu, nb = out

cu = compact(uh, ul, cnt)
int(np.asarray(cu[2][0]))
t0 = time.perf_counter()
for _ in range(4):
    cu = compact(uh, ul, cnt)
    int(np.asarray(cu[2][0]))
emit(config="stream_compact_only", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1))

cap = _next_pow2(max(int(np.asarray(nu).reshape(-1)[0]), 1))
sl = tuple(x[:cap] for x in cu)
m = merge(*sl, *sl)
np.asarray(m[3]).reshape(-1)[0]
t0 = time.perf_counter()
for _ in range(4):
    m = merge(*sl, *sl)
    np.asarray(m[3]).reshape(-1)[0]
emit(config="stream_merge_only", ms=round((time.perf_counter() - t0) / 4 * 1e3, 1), rows=int(sl[0].shape[0]))

# full streamed run, device-side reduction
Ltot = 3 * (1 << 24)
big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, Ltot)]
shards, shard = _shard_with_halo(big.copy(), 1, K, pad_byte=ord("N"))
chunk = 1 << 24
step_len = chunk - (K - 1)
staged = []
for c in range(-(-shard // step_len)):
    rows = shards[:, c * step_len : c * step_len + chunk]
    if rows.shape[1] < chunk:
        rows = np.concatenate(
            [rows, np.full((1, chunk - rows.shape[1]), ord("N"), np.uint8)],
            axis=1,
        )
    staged.append(
        jax.device_put(_rows_to_u32_view(np.ascontiguousarray(rows), V), sharding)
    )


def run_stream():
    def _slice_nu(tbl, nu):
        c = _next_pow2(max(int(np.asarray(nu).max()), 1))
        return tuple(t[:c] for t in tbl)

    stack = LevelStack(
        lambda x, y: merge(*x, *y), lambda out: _slice_nu(out[:3], out[3])
    )
    pending = None
    for aa in staged:
        out = count(aa)
        if pending is not None:
            uh, ul, cnt, nu, nb = pending
            uh, ul, cnt = compact(uh, ul, cnt)
            stack.push(_slice_nu((uh, ul, cnt), nu))
        pending = out
    uh, ul, cnt, nu, nb = pending
    uh, ul, cnt = compact(uh, ul, cnt)
    stack.push(_slice_nu((uh, ul, cnt), nu))
    tbl = stack.fold()
    return int(np.asarray(jnp.sum(tbl[2])))


tot = run_stream()
t0 = time.perf_counter()
tot = run_stream()
dt = time.perf_counter() - t0
emit(
    config="sharded_stream_1dev_devsum",
    total_counted=tot,
    secs=round(dt, 3),
    mbases_s=round(Ltot / dt / 1e6, 1),
)

# six-frame with 1-D tail
from kmers_tpu.parallel.sixframe import (  # noqa: E402
    SixFrameCountConfig,
    _sixframe_local_step,
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

for name, up in (("sixframe_split_1d", True), ("sixframe_jnp_1d", False)):
    stepf = _sixframe_local_step(mesh, cfg.K, tbl_bytes, False, up, False)
    o = stepf(arg6, pad36)
    np.asarray(o[3]).reshape(-1)[0]
    t0 = time.perf_counter()
    for _ in range(4):
        o = stepf(arg6, pad36)
        np.asarray(o[3]).reshape(-1)[0]
    dt = (time.perf_counter() - t0) / 4
    emit(config=name, ms=round(dt * 1e3, 1), mbases_s=round(L6 / dt / 1e6, 1))

emit(done="round6e")

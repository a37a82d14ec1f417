"""Round-6 batch C.

1. streamed sharded count, pre-staged chunks AND device-side final
   reduction (round6b's 4.9 Mb/s host-summed the ~256 MB merged table
   through the tunnel — measuring the link).  Plus per-stage timings.
2. chunk sweep extension: 2^20, 2^19 (2^21 measured 720.3 Mb/s).
3. six-frame with the step-3 window rewrite (one AA lookup per strand,
   no stride_selects) — split and jnp forms.
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
probe = time.perf_counter() - t0
emit(config="probe", secs=round(probe, 2))
if probe > 3:
    emit(abort="chip degraded at probe")
    sys.exit(1)

rng = np.random.default_rng(0)
K = 31
TOT = 1 << 24
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, TOT)]

from kmers_tpu.pipelines.canonical_count import (  # noqa: E402
    _chunk_count_u32,
    _pad_to_u32_view,
)

v, _ = _pad_to_u32_view(acgt)
arg24 = jax.device_put(v)


def steady_scalar(step, reps=16, idx=3):
    out = step()
    np.asarray(out[idx]).reshape(-1)[0]
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        np.asarray(o[idx]).reshape(-1)[0]
    return (time.perf_counter() - t0) / reps


dt = steady_scalar(lambda: _chunk_count_u32(arg24, K))
emit(config="flagship_2_24", ms=round(dt * 1e3, 2), mbases_s=round(TOT / dt / 1e6, 1))
if dt > 0.12:
    emit(abort="chip degraded at flagship sanity")
    sys.exit(1)

# ---- 1. streamed sharded count, device-side reduction ----
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
Ltot = 3 * (1 << 24)
big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, Ltot)]
shards, shard = _shard_with_halo(big.copy(), 1, K, pad_byte=ord("N"))
chunk = 1 << 24
step_len = chunk - (K - 1)
V = _pick_v(chunk)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)

staged = []
n_steps = -(-shard // step_len)
for c in range(n_steps):
    rows = shards[:, c * step_len : c * step_len + chunk]
    if rows.shape[1] < chunk:
        rows = np.concatenate(
            [rows, np.full((1, chunk - rows.shape[1]), ord("N"), np.uint8)],
            axis=1,
        )
    staged.append(
        jax.device_put(_rows_to_u32_view(np.ascontiguousarray(rows), V), sharding)
    )

stage_t = {"count": 0.0, "compact": 0.0, "push": 0.0, "fold": 0.0}


def run_stream(time_stages=False):
    def _slice_nu(tbl, nu):
        cap = _next_pow2(max(int(np.asarray(nu).max()), 1))
        return tuple(t[:, :cap] for t in tbl)

    stack = LevelStack(
        lambda a, b: merge(*a, *b), lambda out: _slice_nu(out[:3], out[3])
    )
    pending = None

    def drain(p):
        t0 = time.perf_counter()
        uh, ul, cnt, nu, nb = p
        uh, ul, cnt = compact(uh, ul, cnt)
        if time_stages:
            stage_t["compact"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        stack.push(_slice_nu((uh, ul, cnt), nu))
        if time_stages:
            stage_t["push"] += time.perf_counter() - t0

    for a in staged:
        t0 = time.perf_counter()
        out = count(a)
        if time_stages:
            stage_t["count"] += time.perf_counter() - t0
        if pending is not None:
            drain(pending)
        pending = out
    drain(pending)
    t0 = time.perf_counter()
    tbl = stack.fold()
    total = jnp.sum(tbl[2])  # DEVICE-side reduction; fetch one scalar
    r = int(np.asarray(total))
    if time_stages:
        stage_t["fold"] += time.perf_counter() - t0
    return r


tot = run_stream()  # warm/compile
t0 = time.perf_counter()
tot = run_stream(time_stages=True)
dt = time.perf_counter() - t0
emit(
    config="sharded_stream_1dev_devsum",
    total_counted=tot,
    secs=round(dt, 3),
    mbases_s=round(Ltot / dt / 1e6, 1),
    stages_ms={k: round(v * 1e3, 1) for k, v in stage_t.items()},
)

# ---- 2. chunk sweep 2^20, 2^19 ----
for logL in (20, 19):
    L = 1 << logL
    n_chunks = TOT // L
    args = []
    for c in range(n_chunks):
        vv, _ = _pad_to_u32_view(acgt[c * L : (c + 1) * L].copy())
        args.append(jax.device_put(vv))

    def stepk():
        return [_chunk_count_u32(a, K) for a in args]

    outs = stepk()
    np.asarray(outs[-1][3]).reshape(-1)[0]
    reps = 16
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        allouts = [stepk() for _ in range(reps)]
        np.asarray(allouts[-1][-1][3]).reshape(-1)[0]
        dts.append((time.perf_counter() - t0) / reps)
    dt = sorted(dts)[1]
    emit(
        config=f"flagship_chunk_2^{logL}",
        ms_per_2_24=round(dt * 1e3, 2),
        mbases_s=round(TOT / dt / 1e6, 1),
        spread_pct=round(100 * (max(dts) - min(dts)) / dt, 1),
        n_chunks=n_chunks,
    )
    del args
    if dt > 0.3:
        emit(note="small-chunk regime dispatch-bound; stopping sweep")
        break

# ---- 3. six-frame with step-3 windows ----
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

for name, use_pallas in (
    ("sixframe_step3_split", True),
    ("sixframe_step3_jnp", False),
):
    stepf = _sixframe_local_step(mesh, cfg.K, tbl_bytes, False, use_pallas, False)
    dt = steady_scalar(lambda: stepf(arg6, pad36), reps=4)
    emit(config=name, ms=round(dt * 1e3, 1), mbases_s=round(L6 / dt / 1e6, 1))

emit(done="round6c")

"""Round-6 batch B: measurements for this round's rewrites.

1. six-frame NEW split step (FE | sort + fused Pallas RLE) at 2^24, 1 dev
   (round5e's 73.1 Mb/s measured the old fused whole-slab step).
2. sharded streamed count with PRE-STAGED device chunks: the per-chunk
   device_put through the remote tunnel measures the link (~4 MB/s), not
   the chip — round5e's 3.9 Mb/s artifact.  Pre-staging isolates the
   compute pipeline, matching every other config's protocol.
3. flagship chunk-size sweep 2^24 -> 2^21 descending, probe-gated.

Aborts unless the probe is fast (chip oscillates between healthy and
~18x-degraded states; degraded numbers are garbage).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


# probe the SECOND execution: the first includes the normal 20-40 s
# remote compile, which is not a degradation signal
def _probe_op():
    return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()


int(np.asarray(_probe_op()))  # compile
t0 = time.perf_counter()
int(np.asarray(_probe_op()))
probe = time.perf_counter() - t0
emit(config="probe", secs=round(probe, 2))
if probe > 3:
    emit(abort="chip degraded at probe")
    sys.exit(1)

rng = np.random.default_rng(0)
TOT = 1 << 24
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, TOT)]
K = 31

from kmers_tpu.pipelines.canonical_count import (  # noqa: E402
    _chunk_count_u32,
    _pad_to_u32_view,
)

# ---- 0. flagship sanity at 2^24 ----
v, _ = _pad_to_u32_view(acgt)
arg24 = jax.device_put(v)


def steady_scalar(step, reps=16):
    out = step()
    int(np.asarray(out[3]))
    t0 = time.perf_counter()
    outs = [step() for _ in range(reps)]
    for o in outs:
        int(np.asarray(o[3]))
    return (time.perf_counter() - t0) / reps


dt = steady_scalar(lambda: _chunk_count_u32(arg24, K))
emit(config="flagship_2_24", ms=round(dt * 1e3, 2), mbases_s=round(TOT / dt / 1e6, 1))
if dt > 0.12:
    emit(abort="chip degraded at flagship sanity")
    sys.exit(1)

# ---- 1. six-frame new split step ----
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from kmers_tpu.parallel import data_mesh  # noqa: E402
from kmers_tpu.parallel.sixframe import (  # noqa: E402
    SixFrameCountConfig,
    _sixframe_local_step,
)

mesh = data_mesh(1)
cfg = SixFrameCountConfig(K=7)
L6 = 1 << 24
H6 = 3 * cfg.K
shard6 = L6 + ((-L6) % 3)
padded6 = np.zeros(shard6 + H6, np.uint8)
padded6[:L6] = acgt[:L6]
shards6 = np.zeros((1, shard6 + 2 * H6), np.uint8)
shards6[0, H6 : H6 + shard6 + H6] = padded6
tbl_bytes = bytes(np.asarray(cfg.code.tbl).tobytes())
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
arg6 = jax.device_put(shards6, sharding)
pad36 = np.zeros(1, np.int32)

for name, use_pallas in (("sixframe_split_pallas", True), ("sixframe_jnp", False)):
    stepf = _sixframe_local_step(mesh, cfg.K, tbl_bytes, False, use_pallas, False)
    dt = steady_scalar(lambda: stepf(arg6, pad36), reps=4)
    emit(config=name, ms=round(dt * 1e3, 1), mbases_s=round(L6 / dt / 1e6, 1))

# ---- 2. sharded streamed count, pre-staged chunks ----
from kmers_tpu.ops.count import _next_pow2  # noqa: E402
from kmers_tpu.parallel.pipeline import (  # noqa: E402
    _compact_step,
    _local_count_step,
    _merge_step,
    _pick_v,
    _rows_to_u32_view,
    _shard_with_halo,
)
from kmers_tpu.utils.levelstack import LevelStack  # noqa: E402

Ltot = 3 * (1 << 24)
big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, Ltot)]
shards, shard = _shard_with_halo(big.copy(), 1, K, pad_byte=ord("N"))
chunk = 1 << 24
step_len = chunk - (K - 1)
V = _pick_v(chunk)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)

# pre-stage every chunk's u32 view on device (compute-pipeline protocol)
staged = []
n_steps = -(-shard // step_len)
for c in range(n_steps):
    rows = shards[:, c * step_len : c * step_len + chunk]
    if rows.shape[1] < chunk:
        rows = np.concatenate(
            [rows, np.full((1, chunk - rows.shape[1]), ord("N"), np.uint8)],
            axis=1,
        )
    view = _rows_to_u32_view(np.ascontiguousarray(rows), V)
    staged.append(jax.device_put(view, sharding))


def run_stream():
    def _slice_nu(tbl, nu):
        cap = _next_pow2(max(int(np.asarray(nu).max()), 1))
        return tuple(t[:, :cap] for t in tbl)

    stack = LevelStack(
        lambda a, b: merge(*a, *b), lambda out: _slice_nu(out[:3], out[3])
    )
    pending = None
    for a in staged:
        out = count(a)
        if pending is not None:
            uh, ul, cnt, nu, nb = pending
            uh, ul, cnt = compact(uh, ul, cnt)
            stack.push(_slice_nu((uh, ul, cnt), nu))
        pending = out
    uh, ul, cnt, nu, nb = pending
    uh, ul, cnt = compact(uh, ul, cnt)
    stack.push(_slice_nu((uh, ul, cnt), nu))
    tbl = stack.fold()
    return int(np.asarray(tbl[2]).sum())


tot = run_stream()  # warm/compile
t0 = time.perf_counter()
tot = run_stream()
dt = time.perf_counter() - t0
emit(
    config="sharded_stream_1dev_prestaged",
    total_counted=tot,
    secs=round(dt, 2),
    mbases_s=round(Ltot / dt / 1e6, 1),
)

# ---- 3. chunk sweep descending ----
results = {}
for logL in (23, 22, 21):
    L = 1 << logL
    n_chunks = TOT // L
    args = []
    for c in range(n_chunks):
        vv, _ = _pad_to_u32_view(acgt[c * L : (c + 1) * L].copy())
        args.append(jax.device_put(vv))

    def stepk():
        return [_chunk_count_u32(a, K) for a in args]

    outs = stepk()
    int(np.asarray(outs[-1][3]))
    reps = 16
    dts = []
    for _ in range(3):
        # enqueue everything, force once at the end: device programs
        # complete in order, so the final scalar gates the whole stream
        # (a per-output fetch would add a ~26 ms round trip each)
        t0 = time.perf_counter()
        allouts = [stepk() for _ in range(reps)]
        int(np.asarray(allouts[-1][-1][3]))
        dts.append((time.perf_counter() - t0) / reps)
    dt = sorted(dts)[1]
    mbs = TOT / dt / 1e6
    results[logL] = mbs
    emit(
        config=f"flagship_chunk_2^{logL}",
        ms_per_2_24=round(dt * 1e3, 2),
        mbases_s=round(mbs, 1),
        spread_pct=round(100 * (max(dts) - min(dts)) / dt, 1),
        n_chunks=n_chunks,
    )
    del args
    if dt > 0.25:
        emit(abort="chip degraded mid-sweep")
        sys.exit(1)

emit(done="round6b")

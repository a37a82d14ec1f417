"""Round-6 batch G: end-state measurements for the round's perf work.
1. bench.py protocol (default chunk 2^21, median-of-3).
2. six-frame streamed local step with pow2-clamped geometry.
3. streamed sharded count end-to-end (sort-form merge + async nu fetch).
"""
import json, subprocess, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

rng = np.random.default_rng(0)
K = 31

# ---- 2. six-frame streamed (clamped) at default chunk over 2^24 bases ----
from jax.sharding import NamedSharding, PartitionSpec as P
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.sixframe import SixFrameCountConfig, sharded_sixframe_aa_count, _sixframe_fe_step, _sixframe_tail_step
mesh = data_mesh(1)
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 24)]

# FE+tail at the clamped geometry: emulate driver geometry
cfg = SixFrameCountConfig(K=7)
H = 21
B = (1 << 23) - 22  # half-size chunk: windows 2(B+22) <= 2^24
B -= B % 3
row_len = B + 2 * H
tbl_bytes = bytes(np.asarray(cfg.code.tbl).tobytes())
fe = _sixframe_fe_step(mesh, cfg.K, tbl_bytes)
tail = _sixframe_tail_step(mesh, cfg.K, False, False)
rows = np.zeros((1, row_len), np.uint8)
rows[0, :] = acgt[:row_len]
arg = jax.device_put(rows, sharding)
pad3 = np.zeros(1, np.int32)

def step():
    hi, lo, nv = fe(arg, pad3)
    return tail(hi, lo)
o = step(); np.asarray(o[3]).reshape(-1)[0]
t0 = time.perf_counter()
outs = [step() for _ in range(8)]
np.asarray(outs[-1][3]).reshape(-1)[0]
dt = (time.perf_counter() - t0) / 8
emit(config="sixframe_clamped_halfchunk", ms=round(dt * 1e3, 1), mbases_s=round(B / dt / 1e6, 1))

# end-to-end public API over 3*2^24 bases (includes exchange + host table)
big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 3 << 24)]
t0 = time.perf_counter()
kmers, counts = sharded_sixframe_aa_count(big.tobytes(), cfg, mesh)
dt1 = time.perf_counter() - t0
t0 = time.perf_counter()
kmers, counts = sharded_sixframe_aa_count(big.tobytes(), cfg, mesh)
dt = time.perf_counter() - t0
emit(config="sixframe_e2e_3x2_24", secs=round(dt, 2), mbases_s=round((3 << 24) / dt / 1e6, 1),
     total=int(counts.sum()), note="includes final host table transfer over remote tunnel")

# ---- 3. streamed sharded end-to-end (device-side total) ----
from kmers_tpu.ops.count import _next_pow2
from kmers_tpu.parallel.pipeline import (
    ShardedCountConfig, _compact_step, _local_count_step, _merge_step,
    _pick_v, _rows_to_u32_view, _shard_with_halo,
)
from kmers_tpu.utils.levelstack import LevelStack
scfg = ShardedCountConfig()
chunk = scfg.chunk_size
shards, shard = _shard_with_halo(big.copy(), 1, K, pad_byte=ord("N"))
step_len = chunk - (K - 1)
V = _pick_v(chunk)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)
staged = []
for c in range(-(-shard // step_len)):
    rows = shards[:, c * step_len : c * step_len + chunk]
    if rows.shape[1] < chunk:
        rows = np.concatenate([rows, np.full((1, chunk - rows.shape[1]), ord("N"), np.uint8)], axis=1)
    staged.append(jax.device_put(_rows_to_u32_view(np.ascontiguousarray(rows), V), sharding))
emit(config="stage_info", n_chunks=len(staged), chunk=chunk)

def run_stream():
    def _slice(tbl, nu):
        c = _next_pow2(max(int(np.asarray(nu).max()), 1))
        return tuple(t[:c] for t in tbl)
    stack = LevelStack(lambda x, y: merge(*x, *y), lambda out: _slice(out[:3], out[3]))
    pending = None
    for aa in staged:
        out = count(aa)
        try: out[3].copy_to_host_async()
        except Exception: pass
        if pending is not None:
            uh, ul, cnt, nu, nb = pending
            uh, ul, cnt = compact(uh, ul, cnt)
            stack.push(_slice((uh, ul, cnt), nu))
        pending = out
    uh, ul, cnt, nu, nb = pending
    uh, ul, cnt = compact(uh, ul, cnt)
    stack.push(_slice((uh, ul, cnt), nu))
    tbl = stack.fold()
    return int(np.asarray(jnp.sum(tbl[2])))

tot = run_stream()
t0 = time.perf_counter()
tot = run_stream()
dt = time.perf_counter() - t0
emit(config="sharded_stream_1dev_2_21", total=tot, secs=round(dt, 3), mbases_s=round((3 << 24) / dt / 1e6, 1))

# ---- 1. bench.py as the driver runs it ----
r = subprocess.run([sys.executable, "bench.py"], capture_output=True, text=True, cwd="/root/repo", timeout=1200)
for line in r.stdout.strip().splitlines():
    if line.startswith("{"):
        emit(config="bench_py", **json.loads(line))
emit(done="round6g")

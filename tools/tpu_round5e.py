"""Round-5 batch E (post-recovery): stride_select, refreshed configs,
sharded streaming rate (SHARDED_r03), flagship sanity."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp

def emit(**kw): print(json.dumps(kw), flush=True)

def force1(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)

def timeit(fn, reps=8):
    force1(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs: force1(o)
    return (time.perf_counter() - t0) / reps

rng = np.random.default_rng(0)

# 0. flagship sanity (known-good ~33.5 ms) — abort if degraded
from kmers_tpu.pipelines.canonical_count import _chunk_count_u32, _pad_to_u32_view
K = 31; L2 = 1 << 24
acgt2 = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L2)]
v, _ = _pad_to_u32_view(acgt2)
arg = jax.device_put(v)
dt = timeit(lambda: _chunk_count_u32(arg, K), reps=16)
emit(config="flagship", ms=round(dt*1e3,1), mbases_s=round(L2/dt/1e6,1))
if dt > 0.12:
    emit(abort="chip degraded"); sys.exit(1)

# 1. stride_select
from kmers_tpu.ops.stride import stride_select
n = 1 << 26
xnp = rng.integers(0, 1 << 32, n, dtype=np.uint32)
x = jax.device_put(xnp)
for s in (3, 7):
    ok = np.array_equal(np.asarray(stride_select(x, s)), xnp[::s])
    emit(config=f"stride_select_s{s}", ms=round(timeit(lambda: stride_select(x, s))*1e3,2), ok=bool(ok))

# 2. spaced + fourbit + extract (post pack_words rewrite)
from kmers_tpu.pipelines.extract import _extract
L = 1 << 26
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
data = jax.device_put(acgt)
@jax.jit
def spaced(b):
    hi, lo, valid, n_inv, n_amb = _extract(b, 31, False, True)
    return stride_select(hi, 7), stride_select(lo, 7)
dt = timeit(lambda: spaced(data))
emit(config="spaced", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

from kmers_tpu.ops.encode import classify_2bit, encode_table
from kmers_tpu.alphabets import DNAAlphabet4
from kmers_tpu.ops.pallas.general_kernel import windows_pallas_general
acgtn = np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, L)]
data_n = jax.device_put(acgtn)
@jax.jit
def four_bit(b):
    codes, valid_sym = encode_table(b, DNAAlphabet4)
    _, certain, _ = classify_2bit(b)
    return windows_pallas_general(codes, certain, 15, bps=4, canonical=True)
dt = timeit(lambda: four_bit(data_n))
emit(config="fourbit", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# 3. sixframe step (stride_select codons + reduce_window pack)
from jax.sharding import NamedSharding, PartitionSpec as P
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.sixframe import SixFrameCountConfig, _sixframe_step
L6 = 1 << 24
mesh = data_mesh(1)
cfg = SixFrameCountConfig(K=7)
H6 = 21
shard6 = L6 + ((-L6) % 3)
padded6 = np.zeros(shard6 + H6, np.uint8); padded6[:L6] = acgt[:L6]
shards6 = np.zeros((1, shard6 + 2*H6), np.uint8)
shards6[0, H6:H6+shard6+H6] = padded6
cap6 = int(np.ceil(2*shard6*cfg.bucket_factor))
tblb = bytes(np.asarray(cfg.code.tbl).tobytes())
stepf6 = _sixframe_step(mesh, cfg.K, cap6, tblb)
arg6 = jax.device_put(shards6, NamedSharding(mesh, P(mesh.axis_names[0], None)))
dt = timeit(lambda: stepf6(arg6), reps=4)
emit(config="sixframe", ms=round(dt*1e3,1), mbases_s=round(L6/dt/1e6,1))

# 4. sharded streaming rate on 1 device (chunk rows = 2^24 exactly now)
from kmers_tpu.parallel.pipeline import (
    _compact_step, _local_count_step, _merge_step, _pick_v,
    _rows_to_u32_view, _shard_with_halo,
)
from kmers_tpu.ops.count import _next_pow2
from kmers_tpu.utils.levelstack import LevelStack
Ltot = 3 * (1 << 24)
big = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, Ltot)]
shards, shard = _shard_with_halo(big.copy(), 1, K, pad_byte=ord("N"))
chunk = 1 << 24
step_len = chunk - (K - 1)
row_len = chunk
V = _pick_v(row_len)
count = _local_count_step(mesh, K, True, False, V)
compact = _compact_step(mesh)
merge = _merge_step(mesh)
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))

def run_stream():
    def _slice_nu(tbl, nu):
        cap = _next_pow2(max(int(np.asarray(nu).max()), 1))
        # tables are 1-D per-device streams since the round-6 boundary
        # refactor (1 device here)
        return tuple(t[:cap] for t in tbl)
    stack = LevelStack(lambda a, b: merge(*a, *b), lambda out: _slice_nu(out[:3], out[3]))
    n_steps = -(-shard // step_len)
    for c in range(n_steps):
        lo_i = c * step_len
        rows = shards[:, lo_i : lo_i + row_len]
        if rows.shape[1] < row_len:
            rows = np.concatenate([rows, np.full((1, row_len - rows.shape[1]), ord("N"), np.uint8)], axis=1)
        view = _rows_to_u32_view(np.ascontiguousarray(rows), V)
        uh, ul, cnt, nu, nb = count(jax.device_put(view, sharding))
        uh, ul, cnt = compact(uh, ul, cnt)
        stack.push(_slice_nu((uh, ul, cnt), nu))
    tbl = stack.fold()
    return int(np.asarray(tbl[2]).sum())

tot = run_stream()  # warm/compile
t0 = time.perf_counter()
tot = run_stream()
dt = time.perf_counter() - t0
emit(config="sharded_stream_1dev", total_counted=tot, secs=round(dt,2), mbases_s=round(Ltot/dt/1e6,1))
emit(done="round5e")

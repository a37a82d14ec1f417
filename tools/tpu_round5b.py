"""Round-5 batch B: re-measure the fixed configs (gather-free lookups,
Mosaic spaced/minimizer path, 1-D sharded FE specs)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp

def emit(**kw): print(json.dumps(kw), flush=True)

def timeit(fn, *args, reps=8):
    out = fn(*args)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    for o in outs:
        leaves = [y for y in jax.tree.leaves(o) if hasattr(y, "ndim")]
        x = min(leaves, key=lambda a: a.size)
        np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    return (time.perf_counter() - t0) / reps

rng = np.random.default_rng(0)
L = 1 << 26
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
data = jax.device_put(acgt)

# 1. fourbit (encode_table now gather-free)
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
dt = timeit(four_bit, data_n)
emit(config="fourbit", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# 2. spaced via Mosaic _extract
from kmers_tpu.pipelines.extract import _extract
@jax.jit
def spaced(b):
    hi, lo, valid, n_inv, n_amb = _extract(b, 31, False, True)
    return hi[::7], lo[::7]
dt = timeit(spaced, data)
emit(config="spaced", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# 3. minimizer via Mosaic _extract
from kmers_tpu.ops.minimizer import minimizers as _minimizers
@jax.jit
def minz(b):
    hi, lo, valid, n_inv, n_amb = _extract(b, 15, True, True)
    return _minimizers(hi, lo, 10)
dt = timeit(minz, data)
emit(config="minimizer", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# 4. sixframe step (gather-free AA lookup)
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

# 5. sharded 1-dev (1-D FE specs)
from kmers_tpu.parallel.pipeline import _pick_v, _rows_to_u32_view, _shard_with_halo, sharded_count_step
L2 = 1 << 24
shards, shard = _shard_with_halo(acgt[:L2].copy(), 1, 31, pad_byte=ord("N"))
cap = int(np.ceil(shard * 2.0))
V = _pick_v(shards.shape[1])
stepf = sharded_count_step(mesh, 31, shard, cap, True, False, V)
view = _rows_to_u32_view(shards, V)
arg_s = jax.device_put(view, NamedSharding(mesh, P(mesh.axis_names[0], None)))
dt = timeit(lambda: stepf(arg_s), reps=16)
emit(config="sharded1", ms=round(dt*1e3,1), mbases_s=round(L2/dt/1e6,1))
emit(done="round5b")

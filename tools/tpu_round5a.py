"""Round-5 batch A: profile the slow bench_all configs.

1. sixframe device program (28 Mb/s — AA-table gather suspect)
2. fourbit windows_pallas_general bps=4 (98 Mb/s)
3. spaced: jnp windows_from_codes + [::7] (169 Mb/s)
4. sharded_count_step on 1 device (219 vs flagship 506 Mb/s)
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp
from kmers_tpu.utils.profiling import device_op_times

def emit(**kw): print(json.dumps(kw), flush=True)

def prof(tag, step, reps=2, top=8):
    out = step()
    jax.tree.map(lambda x: np.asarray(x[(0,)*x.ndim] if getattr(x,'ndim',0) else x), out)
    d = f"/tmp/tb_{tag}"
    jax.profiler.start_trace(d)
    for _ in range(reps):
        out = step()
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x,'ndim')]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    jax.profiler.stop_trace()
    ops = device_op_times(d)
    top_ops = sorted(((n,ms/reps) for n,ms in ops.items() if not n.startswith("$") and "asarray" not in n), key=lambda kv:-kv[1])[:top]
    emit(tag=tag, top_ops=[(n, round(ms,2)) for n,ms in top_ops])

rng = np.random.default_rng(0)

# --- 1. sixframe
from jax.sharding import NamedSharding, PartitionSpec as P
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.sixframe import SixFrameCountConfig, _sixframe_step
L6 = 1 << 24
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L6)]
mesh = data_mesh(1)
cfg = SixFrameCountConfig(K=7)
H6 = 21
shard6 = L6 + ((-L6) % 3)
padded6 = np.zeros(shard6 + H6, np.uint8); padded6[:L6] = acgt
shards6 = np.zeros((1, shard6 + 2*H6), np.uint8)
shards6[0, H6:H6+shard6+H6] = padded6
cap6 = int(np.ceil(2*shard6*cfg.bucket_factor))
tblb = bytes(np.asarray(cfg.code.tbl).tobytes())
stepf6 = _sixframe_step(mesh, cfg.K, cap6, tblb)
arg6 = jax.device_put(shards6, NamedSharding(mesh, P(mesh.axis_names[0], None)))
prof("sixframe", lambda: stepf6(arg6))

# --- 2. fourbit
from kmers_tpu.ops.encode import classify_2bit, encode_table
from kmers_tpu.alphabets import DNAAlphabet4
from kmers_tpu.ops.pallas.general_kernel import windows_pallas_general
L = 1 << 26
acgtn = np.frombuffer(b"ACGTN", dtype=np.uint8)[rng.integers(0, 5, L)]
data_n = jax.device_put(acgtn)
@jax.jit
def four_bit(b):
    codes, valid_sym = encode_table(b, DNAAlphabet4)
    _, certain, _ = classify_2bit(b)
    return windows_pallas_general(codes, certain, 15, bps=4, canonical=True)
prof("fourbit", lambda: four_bit(data_n))

# --- 3. spaced
from kmers_tpu.ops.windows import windows_from_codes
data = jax.device_put(np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)])
@jax.jit
def spaced(b):
    codes, certain, _ = classify_2bit(b)
    hi, lo = windows_from_codes(codes, 31)
    return hi[::7], lo[::7]
prof("spaced", lambda: spaced(data))

# --- 4. sharded 1dev
from kmers_tpu.parallel.pipeline import _pick_v, _rows_to_u32_view, _shard_with_halo, sharded_count_step
L2 = 1 << 24
acgt2 = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L2)]
shards, shard = _shard_with_halo(acgt2.copy(), 1, 31, pad_byte=ord("N"))
cap = int(np.ceil(shard * 2.0))
V = _pick_v(shards.shape[1])
stepf = sharded_count_step(mesh, 31, shard, cap, True, False, V)
view = _rows_to_u32_view(shards, V)
arg_s = jax.device_put(view, NamedSharding(mesh, P(mesh.axis_names[0], None)))
prof("sharded1", lambda: stepf(arg_s))
emit(done="round5a")

"""Round-5 batch C: per-op profiles of sixframe + sharded tail; spaced split test."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp
from kmers_tpu.utils.profiling import device_op_times

def emit(**kw): print(json.dumps(kw), flush=True)

def prof(tag, step, reps=2, top=10):
    out = step()
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    d = f"/tmp/tbc_{tag}"
    jax.profiler.start_trace(d)
    for _ in range(reps):
        out = step()
    leaves = [y for y in jax.tree.leaves(out) if hasattr(y, "ndim")]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    jax.profiler.stop_trace()
    ops = device_op_times(d)
    top_ops = sorted(((n,ms/reps) for n,ms in ops.items() if not n.startswith("$") and "asarray" not in n), key=lambda kv:-kv[1])[:top]
    emit(tag=tag, top_ops=[(n, round(ms,2)) for n,ms in top_ops])

def timeit(fn, reps=8):
    out = fn()
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: a.size)
    np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        leaves = [y for y in jax.tree.leaves(o) if hasattr(y, "ndim")]
        x = min(leaves, key=lambda a: a.size)
        np.asarray(x[(0,)*x.ndim] if x.ndim else x)
    return (time.perf_counter() - t0) / reps

rng = np.random.default_rng(0)

# --- spaced: split dispatch (extract | slice)
from kmers_tpu.pipelines.extract import _extract
L = 1 << 26
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
data = jax.device_put(acgt)
ext = jax.jit(lambda b: _extract(b, 31, False, True))
sl = jax.jit(lambda h, l: (h[::7], l[::7]))
def spaced_split():
    h, l, v, ni, na = ext(data)
    return sl(h, l)
dt = timeit(spaced_split)
emit(config="spaced_split", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# barrier variant in one jit
@jax.jit
def spaced_bar(b):
    h, l, v, ni, na = _extract(b, 31, False, True)
    h, l = jax.lax.optimization_barrier((h, l))
    return h[::7], l[::7]
dt = timeit(lambda: spaced_bar(data))
emit(config="spaced_barrier", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))

# extract alone (what does _extract+transpose cost?)
dt = timeit(lambda: ext(data))
emit(config="extract_only", ms=round(dt*1e3,1), mbases_s=round(L/dt/1e6,1))
prof("extract_only", lambda: ext(data))

# --- sharded tail profile
from jax.sharding import NamedSharding, PartitionSpec as P
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.pipeline import _pick_v, _rows_to_u32_view, _shard_with_halo, sharded_count_step
L2 = 1 << 24
mesh = data_mesh(1)
shards, shard = _shard_with_halo(acgt[:L2].copy(), 1, 31, pad_byte=ord("N"))
cap = int(np.ceil(shard * 2.0))
V = _pick_v(shards.shape[1])
stepf = sharded_count_step(mesh, 31, shard, cap, True, False, V)
view = _rows_to_u32_view(shards, V)
arg_s = jax.device_put(view, NamedSharding(mesh, P(mesh.axis_names[0], None)))
prof("sharded1", lambda: stepf(arg_s))

# --- sixframe profile
from kmers_tpu.parallel.sixframe import SixFrameCountConfig, _sixframe_step
L6 = 1 << 24
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
prof("sixframe", lambda: stepf6(arg6))
emit(done="round5c")

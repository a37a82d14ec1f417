"""Round-5 batch D: stride-select variants + shard_map sort isolation."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp
from jax import lax

def emit(**kw): print(json.dumps(kw), flush=True)

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
n = 1 << 26
xnp = rng.integers(0, 1 << 32, n, dtype=np.uint32)
x = jax.device_put(xnp)
s = 7
m = n // s
ref = xnp[: m * s : s]

def check(tag, fn):
    out = np.asarray(fn())
    ok = np.array_equal(out[: len(ref)], ref)
    dt = timeit(fn)
    emit(variant=tag, ms=round(dt * 1e3, 2), ok=bool(ok))

f1 = jax.jit(lambda a: a[: m * s : s])
check("strided_slice", lambda: f1(x))
f2 = jax.jit(lambda a: a[: m * s].reshape(m, s)[:, 0])
check("reshape_col0", lambda: f2(x))
f3 = jax.jit(lambda a: a[: m * s].reshape(m, s).T[0])
check("reshape_T_row0", lambda: f3(x))

@jax.jit
def rw(a):
    return lax.reduce_window(
        a[: m * s], np.uint32(0), lax.max,
        window_dimensions=(1,), window_strides=(s,), padding="VALID",
    )
check("reduce_window_max", lambda: rw(x))

@jax.jit
def dot_sel(a):
    x2 = a[: m * s].reshape(m, s)
    hi16 = (x2 >> 16).astype(jnp.float32)
    lo16 = (x2 & 0xFFFF).astype(jnp.float32)
    e = jnp.zeros((s,), jnp.float32).at[0].set(1.0)
    h = jnp.dot(hi16, e, preferred_element_type=jnp.float32)
    l = jnp.dot(lo16, e, preferred_element_type=jnp.float32)
    return (h.astype(jnp.uint32) << 16) | l.astype(jnp.uint32)
check("onehot_dot_f32", lambda: dot_sel(x))

# stride 3 (codons)
s3 = 3
m3 = n // s3
ref3 = xnp[: m3 * s3 : s3]
@jax.jit
def rw3(a):
    return lax.reduce_window(
        a[: m3 * s3], np.uint32(0), lax.max,
        window_dimensions=(1,), window_strides=(s3,), padding="VALID",
    )
out = np.asarray(rw3(x)); emit(variant="reduce_window_s3", ms=round(timeit(lambda: rw3(x))*1e3,2), ok=bool(np.array_equal(out, ref3)))

# ---- shard_map sort isolation
from jax.sharding import NamedSharding, PartitionSpec as P
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.pipeline import _pick_v, _rows_to_u32_view, _shard_with_halo, _fe_window_step, _count_tail_only_step
from kmers_tpu.ops.count import sort_count
L2 = 1 << 24
acgt2 = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L2)]
mesh = data_mesh(1)
shards, shard = _shard_with_halo(acgt2.copy(), 1, 31, pad_byte=ord("N"))
V = _pick_v(shards.shape[1])
fe = _fe_window_step(mesh, 31, False, V)
view = _rows_to_u32_view(shards, V)
arg_s = jax.device_put(view, NamedSharding(mesh, P(mesh.axis_names[0], None)))
hi, lo, nb = fe(arg_s)
emit(fe_out_shape=list(hi.shape), sharding=str(hi.sharding))

tail_only = _count_tail_only_step(mesh, 31, False)
dt = timeit(lambda: tail_only(hi, lo))
emit(variant="tail_shardmap_no_exchange", ms=round(dt*1e3,1))

plain = jax.jit(lambda h, l: sort_count(h, l, None, use_pallas=True, key_bits=62))
dt = timeit(lambda: plain(hi, lo))
emit(variant="plain_jit_sort_on_fe_out", ms=round(dt*1e3,1))

# plain jit on device_put copies (fresh default layout)
h2 = jax.device_put(np.asarray(hi)); l2 = jax.device_put(np.asarray(lo))
dt = timeit(lambda: plain(h2, l2))
emit(variant="plain_jit_sort_fresh_arrays", ms=round(dt*1e3,1))
emit(done="round5d")

"""Round-7 batch A: chip validation + measurement of the fused six-frame
Mosaic front-end (ops/pallas/sixframe_kernel.py).

1. probe (abort on degraded chip)
2. kernel-level parity on chip: sixframe_windows_u32_pallas vs the jnp
   FE (_sixframe_fe_body) — multiset of non-sentinel windows + n_valid
3. pipeline parity on chip: sharded_sixframe_aa_count fused vs jnp,
   multi-chunk streamed, 1-device mesh
4. throughput: fused FE+tail step vs the split jnp-FE step at the
   default streamed geometry (chunk ~2^20, ~2^21-window sorts)
"""
import json, sys, time
from collections import Counter

sys.path.insert(0, "/root/repo")
import jax, numpy as np

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

from jax.sharding import NamedSharding, PartitionSpec as P

from kmers_tpu.genetic_codes import standard_genetic_code
from kmers_tpu.ops.count import SENTINEL
from kmers_tpu.ops.pallas.sixframe_kernel import (
    sixframe_tbl16,
    sixframe_windows_u32_pallas,
)
from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.sixframe import (
    SixFrameCountConfig,
    _sixframe_fe_body,
    _sixframe_local_step,
    sharded_sixframe_aa_count,
    _V_SIX,
)

rng = np.random.default_rng(7)
tbl = np.asarray(standard_genetic_code.tbl)
tbl_bytes = bytes(tbl.tobytes())
tbl16 = sixframe_tbl16(tbl_bytes)

# ---- 2. kernel-level parity on chip ----
import jax.numpy as jnp

for K, p3 in ((5, 0), (7, 0), (7, 6)):
    H = 3 * K
    row4 = 1 << 17
    B = row4 - 2 * H - 24
    B -= B % 3
    row_len = B + 2 * H
    b_true = B - p3
    s = rng.choice(
        np.frombuffer(b"ACGTNacgt!", np.uint8), size=row_len,
        p=[0.2, 0.2, 0.2, 0.2, 0.05, 0.04, 0.04, 0.04, 0.025, 0.005],
    ).astype(np.uint8)
    if p3:
        s[H + b_true:] = 0
    hi_j, lo_j, nv_j = jax.jit(
        lambda r, p: _sixframe_fe_body(r, p, K=K, tbl=tbl),
        static_argnums=(),
    )(s[None], np.asarray([p3], np.int32))
    hi_j, lo_j = np.asarray(hi_j), np.asarray(lo_j)
    m = (hi_j != SENTINEL) | (lo_j != SENTINEL)
    want = Counter(zip(hi_j[m].tolist(), lo_j[m].tolist()))
    row = np.zeros(row4, np.uint8); row[:row_len] = s
    bounds = np.zeros(128, np.int32)
    bounds[:4] = (H, H + b_true, 1, b_true + 1)
    hi_k, lo_k, nv_k = jax.jit(
        lambda v, b: sixframe_windows_u32_pallas(v, b, K, V=_V_SIX, tbl16=tbl16)
    )(jnp.asarray(row.view("<u4")), jnp.asarray(bounds))
    hi_k, lo_k = np.asarray(hi_k), np.asarray(lo_k)
    mk = (hi_k != SENTINEL) | (lo_k != SENTINEL)
    got = Counter(zip(hi_k[mk].tolist(), lo_k[mk].tolist()))
    ok = got == want and int(nv_k) == int(nv_j[0]) == int(mk.sum())
    emit(config="kernel_parity", K=K, p3=p3, ok=bool(ok),
         nv=int(nv_k), nv_want=int(nv_j[0]))
    if not ok:
        emit(abort="kernel parity failed"); sys.exit(1)

# ---- 3. pipeline parity on chip (multi-chunk streamed, 1-dev mesh) ----
mesh = data_mesh(1)
s_big = "".join(
    "ACGTNACGTACGTACGT"[i] for i in rng.integers(0, 17, 3 * (1 << 20))
)
t0 = time.perf_counter()
k_f, c_f = sharded_sixframe_aa_count(
    s_big, SixFrameCountConfig(K=7, fused_fe=True), mesh
)
t_f = time.perf_counter() - t0
t0 = time.perf_counter()
k_j, c_j = sharded_sixframe_aa_count(
    s_big, SixFrameCountConfig(K=7, fused_fe=False), mesh
)
t_j = time.perf_counter() - t0
ok = bool(np.array_equal(k_f, k_j) and np.array_equal(c_f, c_j))
emit(config="pipeline_parity_k7_3chunks", ok=ok,
     distinct=int(k_f.shape[0]), secs_fused=round(t_f, 1),
     secs_jnp=round(t_j, 1))
if not ok:
    emit(abort="pipeline parity failed"); sys.exit(1)

# ---- 4. throughput: fused step vs split jnp-FE step ----
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 24)]
K = 7
H = 3 * K

def force(o):
    np.asarray(o[3]).reshape(-1)[0]

def timeit(stepfn, args_list, reps=8):
    outs = [stepfn(*a) for a in args_list]
    force(outs[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [stepfn(*a) for a in args_list]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps

# fused geometry: row4 = 2^20 pow2 rows
row4 = 1 << 20
Bf = row4 - 2 * H - 24
Bf -= Bf % 3
fused_step = _sixframe_local_step(mesh, K, tbl_bytes, False, True, False, True)
args_f = []
n_chunks = (1 << 23) // Bf
for c in range(n_chunks):
    rows = np.zeros((1, row4), np.uint8)
    seg = acgt[c * Bf : c * Bf + Bf + 2 * H]
    rows[0, : seg.size] = seg
    bounds = np.zeros(128, np.int32)
    bounds[:4] = (H, H + Bf, 1, Bf + 1)
    args_f.append((jax.device_put(rows.view("<u4"), sharding),
                   jax.device_put(bounds)))
dt = timeit(fused_step, args_f)
emit(config="fused_step_2^20rows", chunks=n_chunks,
     ms_per_chunk=round(dt / n_chunks * 1e3, 2),
     mbases_s=round(Bf * n_chunks / dt / 1e6, 1))

# split jnp-FE geometry (current default): B = 2^20 - 22 clamp
Bj = (1 << 20) - 22
Bj -= Bj % 3
rowj = Bj + 2 * H
jnp_step = _sixframe_local_step(mesh, K, tbl_bytes, False, True, False, False)
pad3 = np.zeros(1, np.int32)
args_j = []
for c in range(n_chunks):
    rows = np.zeros((1, rowj), np.uint8)
    seg = acgt[c * Bj : c * Bj + rowj]
    rows[0, : seg.size] = seg
    args_j.append((jax.device_put(rows, sharding), jax.device_put(pad3)))
dt_j = timeit(jnp_step, args_j)
emit(config="jnpfe_step_2^20", chunks=n_chunks,
     ms_per_chunk=round(dt_j / n_chunks * 1e3, 2),
     mbases_s=round(Bj * n_chunks / dt_j / 1e6, 1))
emit(config="summary", fused_mbases_s=round(Bf * n_chunks / dt / 1e6, 1),
     jnp_mbases_s=round(Bj * n_chunks / dt_j / 1e6, 1))

"""Round-7 batch G: chip validation + measurement of the MULTI-LIMB
fused six-frame front-end (K_aa 8..32, ops/pallas/sixframe_kernel.py
sixframe_windows_mw_u32_pallas).

1. probe
2. pipeline parity on chip: sharded_sixframe_aa_count fused vs jnp at
   K=9 (M=3) and K=15 (M=4), multi-chunk streamed, 1-device mesh
3. throughput: fused mw step vs jnp mw step at K=9, default geometry
"""
import json, sys, time

sys.path.insert(0, "/root/repo")
import jax, numpy as np

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

from jax.sharding import NamedSharding, PartitionSpec as P

from kmers_tpu.parallel import data_mesh
from kmers_tpu.parallel.sixframe import (
    SixFrameCountConfig,
    _sixframe_local_step_mw,
    sharded_sixframe_aa_count,
)
from kmers_tpu.genetic_codes import standard_genetic_code

rng = np.random.default_rng(9)
mesh = data_mesh(1)

# ---- 2. pipeline parity on chip (multi-chunk streamed) ----
for K in (9, 15):
    s = "".join(
        "ACGTNACGTACGTACGT"[i] for i in rng.integers(0, 17, 3 * (1 << 19))
    )
    t0 = time.perf_counter()
    k_f, c_f = sharded_sixframe_aa_count(
        s, SixFrameCountConfig(K=K, fused_fe=True, chunk_size=1 << 19), mesh
    )
    t_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    k_j, c_j = sharded_sixframe_aa_count(
        s, SixFrameCountConfig(K=K, fused_fe=False, chunk_size=1 << 19), mesh
    )
    t_j = time.perf_counter() - t0
    ok = bool(
        [int(a) for a in k_f] == [int(b) for b in k_j]
        and np.array_equal(c_f, c_j)
    )
    emit(config=f"pipeline_parity_k{K}", ok=ok, distinct=int(k_f.shape[0]),
         secs_fused=round(t_f, 1), secs_jnp=round(t_j, 1))
    if not ok:
        emit(abort="parity failed"); sys.exit(1)

# ---- 3. throughput: fused vs jnp mw step at K=9 ----
K = 9
H = 3 * K
tbl_bytes = bytes(np.asarray(standard_genetic_code.tbl).tobytes())
sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 23)]

def force(o):
    np.asarray(o[2]).reshape(-1)[0]

def timeit(stepfn, args_list, reps=8):
    outs = [stepfn(*a) for a in args_list]
    force(outs[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [stepfn(*a) for a in args_list]
    force(outs[-1])
    return (time.perf_counter() - t0) / reps

row4 = 1 << 20
Bf = row4 - 2 * H - 24
Bf -= Bf % 3
fstep = _sixframe_local_step_mw(mesh, K, tbl_bytes, False, True, False)
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
dt = timeit(fstep, args_f)
emit(config="fused_mw_step_k9", chunks=n_chunks,
     mbases_s=round(Bf * n_chunks / dt / 1e6, 1))

# approximate jnp-step geometry (NOT the pipeline's exact shaved B —
# off by 30 bases ≈ 0.003%; both forms pad to the same 2^21 sort)
Bj = (1 << 20) - 2 * H - 2
Bj -= Bj % 3
rowj = Bj + 2 * H
jstep = _sixframe_local_step_mw(mesh, K, tbl_bytes, False)
pad3 = np.zeros(1, np.int32)
args_j = []
for c in range(n_chunks):
    rows = np.zeros((1, rowj), np.uint8)
    seg = acgt[c * Bj : c * Bj + rowj]
    rows[0, : seg.size] = seg
    args_j.append((jax.device_put(rows, sharding), jax.device_put(pad3)))
dt_j = timeit(jstep, args_j)
emit(config="jnp_mw_step_k9", chunks=n_chunks,
     mbases_s=round(Bj * n_chunks / dt_j / 1e6, 1))
emit(config="summary", fused=round(Bf * n_chunks / dt / 1e6, 1),
     jnp=round(Bj * n_chunks / dt_j / 1e6, 1))

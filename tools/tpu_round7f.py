"""Round-7 batch F: lane-tile width (V) sweep for the fused six-frame
kernel.  _V_SIX=4096 was adopted untested against 2048/8192; the kernel
holds ~40 live (1, V) vectors (8 tree-eval outputs + 20 accumulators),
so a smaller tile may trade roll count for register pressure.
"""
import json, statistics, sys, time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

from kmers_tpu.genetic_codes import standard_genetic_code
from kmers_tpu.ops.pallas.sixframe_kernel import (
    sixframe_tbl16,
    sixframe_windows_u32_pallas,
)

rng = np.random.default_rng(0)
K = 7
H = 3 * K
row4 = 1 << 20
B = row4 - 2 * H - 24
B -= B % 3
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, 1 << 23)]
tbl16 = sixframe_tbl16(bytes(np.asarray(standard_genetic_code.tbl).tobytes()))

bounds = np.zeros(128, np.int32)
bounds[:4] = (H, H + B, 1, B + 1)
bounds_d = jax.device_put(jnp.asarray(bounds))
n_chunks = (1 << 23) // B
rows = []
for c in range(n_chunks):
    r = np.zeros(row4, np.uint8)
    seg = acgt[c * B : c * B + B + 2 * H]
    r[: seg.size] = seg
    rows.append(jax.device_put(jnp.asarray(r.view("<u4"))))

def make_fe(V):
    @jax.jit
    def fe(v, b):
        return sixframe_windows_u32_pallas(v, b, K, V=V, tbl16=tbl16)
    return fe

fes = {V: make_fe(V) for V in (1024, 2048, 4096, 8192)}

def force(o):
    np.asarray(o[2])

for V, fe in fes.items():
    force(fe(rows[0], bounds_d))

samples = {V: [] for V in fes}
for _ in range(5):
    for V, fe in fes.items():
        t0 = time.perf_counter()
        for _ in range(3):
            outs = [fe(r, bounds_d) for r in rows]
        force(outs[-1])
        samples[V].append(3 * B * n_chunks / (time.perf_counter() - t0) / 1e6)

for V, v in samples.items():
    med = statistics.median(v)
    emit(config=f"fe_only_V{V}", median_mbs=round(med, 1),
         spread_pct=round(100 * (max(v) - min(v)) / med, 1),
         runs=[round(x, 1) for x in v])

"""Round-7 batch B: K=47 multiword gap — profile + split-dispatch fix.

BENCH_ALL r04 measured canonical_47mer at 441.3 Mb/s = 57% of flagship;
the 3-vs-2 sort-operand structure predicts ~2/3 (~515).  Hypothesis: the
benched form (tools/bench_all.py count47) is ONE jit fusing the Mosaic
FE with the sort, paying the same Mosaic->sort relayout the flagship
eliminated by splitting dispatches (_chunk_count_u32 docstring).  The
PIPELINE (_canonical_count_multiword) already splits; the bench didn't.

1. probe
2. flagship reference number this session
3. count47 one-jit (bench_all r04 form) at default chunks
4. count47 split (fe_fn_u32 | count_fn_mw — the pipeline's form)
5. chunk sweep for the split form
6. per-HLO profile of both forms
"""
import json, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

from kmers_tpu.ops.multiword import sort_count_mw
from kmers_tpu.ops.pallas.multiword_kernel import canonical_windows_mw_pallas
from kmers_tpu.pipelines.canonical_count import (
    _chunk_count_u32,
    _pad_to_u32_view,
)

rng = np.random.default_rng(0)
L = 1 << 24
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
K = 47

def force(o):
    leaves = [x for x in jax.tree.leaves(o) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: getattr(a, "size", 1 << 62))
    np.asarray(x if x.ndim == 0 else x[(0,) * x.ndim])

def timeit(fn, reps=8):
    force(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    force(o)
    return (time.perf_counter() - t0) / reps

def stage(CH):
    args = []
    for c in range(L // CH):
        v, _ = _pad_to_u32_view(acgt[c * CH : (c + 1) * CH].copy())
        args.append(jax.device_put(v))
    return args

# ---- 2. flagship reference (chunk 2^20) ----
CH0 = 1 << 20
args31 = stage(CH0)
dt = timeit(lambda: [_chunk_count_u32(a, 31) for a in args31])
flag_mbs = L / dt / 1e6
emit(config="flagship_ref", mbases_s=round(flag_mbs, 1))

# ---- 3. count47 one-jit (bench_all r04 form) ----
@jax.jit
def count47_fused(v):
    limbs, n_bad, n_amb = canonical_windows_mw_pallas(v, K)
    ones = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    is_sent = None
    for x in limbs:
        s = x == ones
        is_sent = s if is_sent is None else is_sent & s
    return sort_count_mw(limbs, ~is_sent, key_bits=2 * K)

# ---- 4. split form (the pipeline's) ----
@jax.jit
def fe47(v):
    return canonical_windows_mw_pallas(v, K)

@jax.jit
def tail47(limbs):
    ones = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    is_sent = None
    for x in limbs:
        s = x == ones
        is_sent = s if is_sent is None else is_sent & s
    return sort_count_mw(limbs, ~is_sent, key_bits=2 * K)

def count47_split(v):
    limbs, n_bad, n_amb = fe47(v)
    return tail47(limbs)

for CH in (1 << 19, 1 << 20, 1 << 21):
    args = stage(CH)
    dt_f = timeit(lambda: [count47_fused(a) for a in args])
    dt_s = timeit(lambda: [count47_split(a) for a in args])
    emit(config=f"count47_chunk_2^{CH.bit_length()-1}",
         fused_mbs=round(L / dt_f / 1e6, 1),
         split_mbs=round(L / dt_s / 1e6, 1),
         pct_of_flagship_split=round(100 * L / dt_s / 1e6 / flag_mbs, 1))

# ---- 6. per-HLO profile at 2^20 ----
from kmers_tpu.utils.profiling import profile_step

args = stage(1 << 20)
def step_fused():
    o = [count47_fused(a) for a in args]
    force(o[-1])
def step_split():
    o = [count47_split(a) for a in args]
    force(o[-1])
emit(profile="fused", top=[
    (n, round(ms, 1)) for n, ms in profile_step(step_fused, reps=2, top=12)
])
emit(profile="split", top=[
    (n, round(ms, 1)) for n, ms in profile_step(step_split, reps=2, top=12)
])

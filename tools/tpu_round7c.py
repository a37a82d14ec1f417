"""Round-7 batch C: K=47 chunk/form deep sweep (stability check).

7b found the ONE-JIT form at 2^19 chunks measuring 627.6 Mb/s = 79.6% of
the same-session flagship — far past the ~515 structural expectation.
The flagship's own 2^19 was CLOSED as a default for 49% spread
(NOTES_R6); this sweep checks whether K=47's small-chunk win is stable:
median-of-5 over repeated interleaved passes, fused (one-jit) vs split
forms at 2^18/2^19/2^20, with a flagship reference in the same session.
"""
import json, statistics, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

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

def stage(CH):
    args = []
    for c in range(L // CH):
        v, _ = _pad_to_u32_view(acgt[c * CH : (c + 1) * CH].copy())
        args.append(jax.device_put(v))
    return args

@jax.jit
def count47_fused(v):
    limbs, n_bad, n_amb = canonical_windows_mw_pallas(v, K)
    ones = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    is_sent = None
    for x in limbs:
        s = x == ones
        is_sent = s if is_sent is None else is_sent & s
    return sort_count_mw(limbs, ~is_sent, key_bits=2 * K)

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
    limbs, _, _ = fe47(v)
    return tail47(limbs)

configs = {}
for CH in (1 << 18, 1 << 19, 1 << 20):
    args = stage(CH)
    configs[f"fused_2^{CH.bit_length()-1}"] = (
        lambda a=args: [count47_fused(x) for x in a]
    )
    configs[f"split_2^{CH.bit_length()-1}"] = (
        lambda a=args: [count47_split(x) for x in a]
    )
args31 = stage(1 << 20)
configs["flagship_2^20"] = lambda a=args31: [_chunk_count_u32(x, 31) for x in a]

# warm up every program
for fn in configs.values():
    force(fn()[-1])

# 5 interleaved passes, 4 reps each -> per-config median + spread
samples = {k: [] for k in configs}
for _ in range(5):
    for k, fn in configs.items():
        t0 = time.perf_counter()
        for _ in range(4):
            o = fn()
        force(o[-1])
        samples[k].append(L * 4 / (time.perf_counter() - t0) / 1e6)

for k, v in samples.items():
    med = statistics.median(v)
    emit(config=k, median_mbs=round(med, 1),
         spread_pct=round(100 * (max(v) - min(v)) / med, 1),
         runs=[round(x, 1) for x in v])

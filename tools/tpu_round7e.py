"""Round-7 batch E: reconcile the sharded-1dev record (VERDICT r4 #5).

r04 left two artifacts straddling the 70% bar: SHARDED_r04.json said
524.3 Mb/s = 72.6% (median-of-3 protocol) while BENCH_ALL said 493.5 vs
flagship 727.6 = 67.8% (one 8-rep pass, different session).  The
protocols are near-identical (sharded_count_step at default chunks, 8
pre-staged rows over 2^24, identity exchange on 1 device) — the
discrepancy is chip state between sessions.  This run measures flagship
and sharded in INTERLEAVED passes of one session, median-of-5, and also
tries the 2^20 sharded chunk (the flagship moved to 2^20 in r04; the
sharded default stayed 2^21).
"""
import json, statistics, sys, time

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
from kmers_tpu.parallel.pipeline import (
    _pick_v,
    _rows_to_u32_view,
    _shard_with_halo,
    sharded_count_step,
)
from kmers_tpu.pipelines.canonical_count import (
    _chunk_count_u32,
    _pad_to_u32_view,
)

rng = np.random.default_rng(0)
L = 1 << 24
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, L)]
K = 31

def force(o):
    leaves = [x for x in jax.tree.leaves(o) if hasattr(x, "ndim")]
    x = min(leaves, key=lambda a: getattr(a, "size", 1 << 62))
    np.asarray(x if x.ndim == 0 else x[(0,) * x.ndim])

# flagship form: default 2^20 chunks
args31 = []
for c in range(L // (1 << 20)):
    v, _ = _pad_to_u32_view(acgt[c << 20 : (c + 1) << 20].copy())
    args31.append(jax.device_put(v))

def flagship():
    return [_chunk_count_u32(a, K) for a in args31]

# sharded-1dev forms at chunk 2^21 (current default) and 2^20
mesh1 = data_mesh(1)
sharding1 = NamedSharding(mesh1, P(mesh1.axis_names[0], None))

def stage_sharded(CH):
    args, stepf = [], None
    for c in range(L // CH):
        seg = acgt[c * CH : (c + 1) * CH]
        shards, shard = _shard_with_halo(seg.copy(), 1, K, pad_byte=ord("N"))
        cap = int(np.ceil(shard * 2.0))
        V = _pick_v(shards.shape[1])
        if stepf is None:
            stepf = sharded_count_step(mesh1, K, shard, cap, True, False, V)
        args.append(jax.device_put(_rows_to_u32_view(shards, V), sharding1))
    return stepf, args

step21, argss21 = stage_sharded(1 << 21)
step20, argss20 = stage_sharded(1 << 20)

forms = {
    "flagship_2^20": flagship,
    "sharded1dev_2^21": lambda: [step21(a) for a in argss21],
    "sharded1dev_2^20": lambda: [step20(a) for a in argss20],
}
for fn in forms.values():
    force(fn()[-1])

samples = {k: [] for k in forms}
for _ in range(5):
    for k, fn in forms.items():
        t0 = time.perf_counter()
        for _ in range(4):
            o = fn()
        force(o[-1])
        samples[k].append(L * 4 / (time.perf_counter() - t0) / 1e6)

meds = {}
for k, v in samples.items():
    med = statistics.median(v)
    meds[k] = med
    emit(config=k, median_mbs=round(med, 1),
         spread_pct=round(100 * (max(v) - min(v)) / med, 1),
         runs=[round(x, 1) for x in v])
emit(config="ratios",
     sharded21_pct=round(100 * meds["sharded1dev_2^21"] / meds["flagship_2^20"], 1),
     sharded20_pct=round(100 * meds["sharded1dev_2^20"] / meds["flagship_2^20"], 1))

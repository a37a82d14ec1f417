"""Round-7 batch D: the 2^19 batched-dispatch experiment (VERDICT r4 #7).

r04 measured the flagship at 2^19 chunks reaching 833.5 Mb/s median but
with 49% spread from host-dispatch overhead (32 dispatch pairs per 2^24),
so 2^20 stayed the default.  This experiment amortizes dispatch instead
of avoiding it: ONE sort dispatch over a (B, n) batch of window rows with
per-row RLE — counting is partition-agnostic, so rows are just segments
of one big FE's flat window stream (no K-1 overlap, no separators).

Forms measured (median-of-5 interleaved, 2^24 bases each):
  A. default: per-chunk split FE|sort+RLE at 2^20 (16 x 2 dispatches)
  B. per-chunk split at 2^19 (32 x 2 dispatches; the high-spread form)
  C. one FE(2^24) + ONE batched sort+rowRLE (32, 2^19)
  D. one FE(2^24) + ONE batched sort+rowRLE (16, 2^20)
  E. one FE(2^24) + one flat sort+RLE 2^24 (the known-slow big-sort form)
"""
import json, statistics, sys, time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax

def emit(**kw): print(json.dumps(kw), flush=True)

def _p(): return jax.numpy.arange(1 << 16, dtype=jax.numpy.uint32).sum()
int(np.asarray(_p())); t0 = time.perf_counter(); int(np.asarray(_p()))
emit(config="probe", secs=round(time.perf_counter() - t0, 2))
if time.perf_counter() - t0 > 3:
    emit(abort="degraded"); sys.exit(1)

from kmers_tpu.ops.count import SENTINEL
from kmers_tpu.pipelines.canonical_count import (
    _chunk_count_u32,
    _fe_u32,
    _count_u32,
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

def stage(CH):
    args = []
    for c in range(L // CH):
        v, _ = _pad_to_u32_view(acgt[c * CH : (c + 1) * CH].copy())
        args.append(jax.device_put(v))
    return args

v_all, _ = _pad_to_u32_view(acgt.copy())
v_all = jax.device_put(v_all)

@partial(jax.jit, static_argnames=("B",))
def batched_tail(hi, lo, B: int):
    """ONE dispatch: row-wise unstable sort + per-row weighted RLE over a
    (B, n) reshape of the flat window stream."""
    n = hi.shape[0] // B
    h2 = hi.reshape(B, n)
    l2 = lo.reshape(B, n)
    sh, sl = lax.sort((h2, l2), dimension=1, num_keys=2, is_stable=False)
    sent = jnp.asarray(SENTINEL, jnp.uint32)
    neq = (sh[:, 1:] != sh[:, :-1]) | (sl[:, 1:] != sl[:, :-1])
    first = jnp.concatenate([jnp.ones((B, 1), bool), neq], axis=1)
    is_last = jnp.concatenate([first[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    wcum = jnp.arange(1, n + 1, dtype=jnp.int32)[None, :]
    start_w = lax.cummax(jnp.where(first, wcum - 1, 0), axis=1)
    run_total = wcum - start_w
    is_sent_row = (sh == sent) & (sl == sent)
    emit_m = is_last & ~is_sent_row
    uh = jnp.where(emit_m, sh, sent)
    ul = jnp.where(emit_m, sl, sent)
    cnt = jnp.where(emit_m, run_total, 0)
    nu = jnp.sum(first, axis=1, dtype=jnp.int32) - is_sent_row[:, -1].astype(
        jnp.int32
    )
    return uh, ul, cnt, nu

args20 = stage(1 << 20)
args19 = stage(1 << 19)

def form_A():
    return [_chunk_count_u32(a, K) for a in args20]

def form_B():
    return [_chunk_count_u32(a, K) for a in args19]

def form_C():
    hi, lo, nb, na = _fe_u32(v_all, K)
    return batched_tail(hi, lo, 32)

def form_D():
    hi, lo, nb, na = _fe_u32(v_all, K)
    return batched_tail(hi, lo, 16)

def form_E():
    hi, lo, nb, na = _fe_u32(v_all, K)
    return _count_u32(hi, lo, K)

forms = {"A_split_2^20": form_A, "B_split_2^19": form_B,
         "C_batched_32x2^19": form_C, "D_batched_16x2^20": form_D,
         "E_flat_2^24": form_E}

for fn in forms.values():
    force(fn())

samples = {k: [] for k in forms}
for _ in range(5):
    for k, fn in forms.items():
        t0 = time.perf_counter()
        for _ in range(4):
            o = fn()
        force(o)
        samples[k].append(L * 4 / (time.perf_counter() - t0) / 1e6)

for k, v in samples.items():
    med = statistics.median(v)
    emit(config=k, median_mbs=round(med, 1),
         spread_pct=round(100 * (max(v) - min(v)) / med, 1),
         runs=[round(x, 1) for x in v])

# correctness spot check: total counted windows must match form A
outA = form_A()
totA = sum(int(np.asarray(o[2]).sum()) for o in outA)
# A chunks overlap-free here (no K-1 stitching in this protocol), so
# compare C against E (identical window multiset)
outC = form_C()
outE = form_E()
totC = int(np.asarray(outC[2]).sum())
totE = int(np.asarray(outE[2]).sum())
emit(config="conservation", total_C=totC, total_E=totE, equal=bool(totC == totE))

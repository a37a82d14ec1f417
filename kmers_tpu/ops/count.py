"""Sort-based unique counting of U64 kmer streams.

The in-framework replacement for the reference's user-side dict counting
(SURVEY.md §3.3: "user code: counts[kmer] += 1").  XLA wants static shapes
and no dynamic allocation, so counting is a deterministic sort +
run-length encode: lexicographic two-key sort of (hi, lo), group
boundaries by neighbor comparison, per-group counts by segment-sum.
Results are dense, sorted, and bit-exact reproducible — the property the
multi-device hash-prefix merge (kmers_tpu.parallel) relies on.

Invalid/masked windows are routed to the all-ones sentinel, which sorts
last and is dropped; callers must keep K*bps <= 62 so real registers can
never equal the sentinel (true for the K<=31 DNA north star).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["sort_count", "merge_sorted_counts", "SENTINEL"]

_U32 = jnp.uint32
_I32 = jnp.int32

#: sentinel register value (sorts after every valid kmer with K*bps <= 62)
SENTINEL = 0xFFFFFFFF


@jax.jit
def sort_count(hi, lo, valid=None):
    """Count distinct kmers in a U64 stream.

    Returns ``(uniq_hi, uniq_lo, counts, n_unique)`` where the first
    ``n_unique`` slots hold the sorted distinct kmers and their
    multiplicities; remaining slots are sentinel/zero padding (static
    shapes — callers slice with ``n_unique`` host-side).
    """
    n = hi.shape[0]
    sent = jnp.asarray(SENTINEL, _U32)
    if valid is not None:
        hi = jnp.where(valid, hi, sent)
        lo = jnp.where(valid, lo, sent)
    shi, slo = lax.sort((hi, lo), num_keys=2)
    first = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
        ]
    )
    gid = jnp.cumsum(first.astype(_I32)) - 1
    counts = jax.ops.segment_sum(
        jnp.ones(n, _I32), gid, num_segments=n, indices_are_sorted=True
    )
    uniq_hi = jnp.full(n, SENTINEL, _U32).at[gid].set(shi)
    uniq_lo = jnp.full(n, SENTINEL, _U32).at[gid].set(slo)
    is_sentinel = (uniq_hi == sent) & (uniq_lo == sent)
    counts = jnp.where(is_sentinel, 0, counts)
    n_unique = jnp.sum(first.astype(_I32)) - jnp.any(
        (shi == sent) & (slo == sent)
    ).astype(_I32)
    return uniq_hi, uniq_lo, counts, n_unique


@jax.jit
def merge_sorted_counts(hi_a, lo_a, cnt_a, hi_b, lo_b, cnt_b):
    """Merge two (sorted-unique, counts) tables into one.

    Sentinel-padded inputs merge cleanly: sentinels keep zero counts and
    stay at the end.  Used for streaming chunk accumulation and for the
    cross-device table merge.
    """
    hi = jnp.concatenate([hi_a, hi_b])
    lo = jnp.concatenate([lo_a, lo_b])
    cnt = jnp.concatenate([cnt_a, cnt_b]).astype(_I32)
    n = hi.shape[0]
    sent = jnp.asarray(SENTINEL, _U32)
    shi, slo, scnt = lax.sort((hi, lo, cnt), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones(1, bool), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])]
    )
    gid = jnp.cumsum(first.astype(_I32)) - 1
    counts = jax.ops.segment_sum(
        scnt, gid, num_segments=n, indices_are_sorted=True
    )
    uniq_hi = jnp.full(n, SENTINEL, _U32).at[gid].set(shi)
    uniq_lo = jnp.full(n, SENTINEL, _U32).at[gid].set(slo)
    is_sentinel = (uniq_hi == sent) & (uniq_lo == sent)
    counts = jnp.where(is_sentinel, 0, counts)
    n_unique = jnp.sum(first.astype(_I32)) - jnp.any(
        (shi == sent) & (slo == sent)
    ).astype(_I32)
    return uniq_hi, uniq_lo, counts, n_unique

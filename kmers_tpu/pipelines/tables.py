"""Count-table algebra: set/multiset operations on (kmers, counts) tables.

The reference leaves counting — and therefore count-table manipulation —
to user-side ``Dict`` code (``mergewith!(+, d1, d2)`` and friends over
the dicts built in /root/reference/docs/src/composition.md's workflow).
Here count tables are a framework type: the sorted ``(kmers, counts)``
pair returned by :func:`kmers_tpu.pipelines.canonical_count_bytes` (and
by the sharded pipelines).  This module provides the algebra over them:

- :func:`merge_counts` — multiset sum (the dict-merge idiom),
- :func:`intersect_counts` — keys in both (count = min or sum),
- :func:`subtract_counts` — saturating multiset difference,
- :func:`multiplicity_spectrum` — the k-mer multiplicity histogram,
- :func:`merge_counts_device` — device-resident bitonic merge for large
  tables (wraps :func:`kmers_tpu.ops.count.merge_compact_tables`).

All host functions accept uint64 tables (K <= 31) and object-dtype
tables of Python ints (the K > 31 multi-limb representation); inputs
must be sorted-unique, which every framework producer guarantees.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "merge_counts",
    "intersect_counts",
    "subtract_counts",
    "multiplicity_spectrum",
    "merge_counts_device",
    "jaccard_exact",
    "containment",
]


def _check_table(kmers, counts):
    kmers = np.asarray(kmers)
    counts = np.asarray(counts, dtype=np.int64)
    if kmers.shape != counts.shape or kmers.ndim != 1:
        raise ValueError("a count table is a pair of equal-length 1-D arrays")
    return kmers, counts


def merge_counts(a_kmers, a_counts, b_kmers, b_counts):
    """Multiset sum of two count tables: every key from either table,
    counts added.  Returns a sorted-unique ``(kmers, counts)`` pair —
    the table the concatenated inputs would have counted to."""
    ak, ac = _check_table(a_kmers, a_counts)
    bk, bc = _check_table(b_kmers, b_counts)
    if ak.dtype == np.uint64 and bk.dtype == np.uint64:
        # u64 fast path: the C++ two-pointer merge (numpy fallback inside)
        from ..io.fasta import merge_count_tables_native

        return merge_count_tables_native(ak, ac, bk, bc)
    keys = np.concatenate([ak, bk])
    cnts = np.concatenate([ac, bc])
    uniq, inv = np.unique(keys, return_inverse=True)
    summed = np.zeros(uniq.size, np.int64)
    np.add.at(summed, inv, cnts)
    return uniq, summed

def intersect_counts(a_kmers, a_counts, b_kmers, b_counts, mode: str = "min"):
    """Keys present in *both* tables.  ``mode="min"`` gives the multiset
    intersection (count = min of the two); ``mode="sum"`` gives the
    total coverage of the shared keys."""
    if mode not in ("min", "sum"):
        raise ValueError("mode must be 'min' or 'sum'")
    ak, ac = _check_table(a_kmers, a_counts)
    bk, bc = _check_table(b_kmers, b_counts)
    common, ia, ib = np.intersect1d(
        ak, bk, assume_unique=True, return_indices=True
    )
    c = (
        np.minimum(ac[ia], bc[ib])
        if mode == "min"
        else ac[ia] + bc[ib]
    )
    return common, c.astype(np.int64)


def subtract_counts(a_kmers, a_counts, b_kmers, b_counts):
    """Saturating multiset difference ``a - b``: counts of ``b`` are
    subtracted from ``a``; keys that reach zero (or below) drop out."""
    ak, ac = _check_table(a_kmers, a_counts)
    bk, bc = _check_table(b_kmers, b_counts)
    common, ia, ib = np.intersect1d(
        ak, bk, assume_unique=True, return_indices=True
    )
    rem = ac.copy()
    rem[ia] -= bc[ib]
    keep = rem > 0
    return ak[keep], rem[keep]


def multiplicity_spectrum(counts, max_multiplicity: int | None = None):
    """K-mer multiplicity histogram: ``spectrum[m]`` = number of distinct
    kmers occurring exactly ``m`` times (index 0 is always 0).  The
    standard genome-profiling curve (coverage/error separation).  With
    ``max_multiplicity`` the tail is clamped into the last bin and the
    spectrum always has exactly ``max_multiplicity + 1`` entries (fixed
    layout even when no count reaches the clamp)."""
    counts = np.asarray(counts, dtype=np.int64)
    minlength = 2
    if max_multiplicity is not None:
        counts = np.minimum(counts, max_multiplicity)
        minlength = max_multiplicity + 1
    return np.bincount(counts, minlength=minlength).astype(np.int64)


def jaccard_exact(a_kmers, b_kmers) -> float:
    """Exact Jaccard index of two tables' distinct-kmer sets,
    |A ∩ B| / |A ∪ B| (the quantity :func:`kmers_tpu.pipelines.jaccard`
    estimates from MinHash sketches).  1.0 for two empty tables."""
    a = np.asarray(a_kmers)
    b = np.asarray(b_kmers)
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return float(inter / union) if union else 1.0


def containment(a_kmers, b_kmers) -> float:
    """Containment of A in B: |A ∩ B| / |A| (Mash-screen style; 1.0
    when every distinct kmer of A occurs in B, and for empty A)."""
    a = np.asarray(a_kmers)
    b = np.asarray(b_kmers)
    if a.size == 0:
        return 1.0
    return float(np.intersect1d(a, b, assume_unique=True).size / a.size)


def merge_counts_device(a_kmers, a_counts, b_kmers, b_counts):
    """:func:`merge_counts` on device: split u64 keys to (hi, lo) u32
    pairs and run the bitonic table merge the streaming accumulator uses
    (kmers_tpu/ops/count.py merge_compact_tables).  Worth it for tables
    of millions of keys; K <= 31 (u64 registers) only.

    The device merge accumulates in int32: every input count — and every
    merged sum — must stay below 2^31.  Inputs that could overflow fall
    back to the int64-safe host :func:`merge_counts`."""
    from ..ops.count import merge_compact_tables

    a_counts = np.asarray(a_counts, dtype=np.int64)
    b_counts = np.asarray(b_counts, dtype=np.int64)
    # a merged count is at most max(a) + max(b); if that can overflow the
    # device accumulator's int32, use the host path (exactness first)
    amax = int(a_counts.max()) if a_counts.size else 0
    bmax = int(b_counts.max()) if b_counts.size else 0
    if amax + bmax >= 2**31:
        return merge_counts(a_kmers, a_counts, b_kmers, b_counts)

    def split(k):
        k = np.asarray(k, dtype=np.uint64)
        return (k >> np.uint64(32)).astype(np.uint32), k.astype(np.uint32)

    ah, al = split(a_kmers)
    bh, bl = split(b_kmers)
    uh, ul, cnt, nu = merge_compact_tables(
        ah, al, np.asarray(a_counts, np.int32),
        bh, bl, np.asarray(b_counts, np.int32),
    )
    n = int(nu)
    uh, ul, cnt = (np.asarray(x)[:n] for x in (uh, ul, cnt))
    kmers = (uh.astype(np.uint64) << np.uint64(32)) | ul.astype(np.uint64)
    return kmers, cnt.astype(np.int64)

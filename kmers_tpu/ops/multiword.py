"""Multi-word window extraction and counting: K*bps > 64.

Generalizes the (hi, lo) pair of :mod:`kmers_tpu.ops.windows` to M uint32
limbs (big-endian: limb 0 most significant), covering e.g. canonical
63-mers (M=4) — the reference's multi-word ``NTuple`` kmers
(/root/reference/src/kmer.jl:32-44) on the array plane.  Lexicographic
limb order == symbol order, exactly like the 64-bit case, so canonical
selection and sorting are limb-wise.

Counting sorts with M keys; instead of a sentinel register value (which
could collide when bits == 32*M), an explicit invalid-flag limb leads the
sort keys, so masked windows sort last unconditionally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .encode import PER_WORD, pack_words
from ..kmer import FX_CONSTANT
from . import u64

__all__ = [
    "n_limbs",
    "windows_mw",
    "rc_windows_mw",
    "canonical_windows_mw",
    "sort_count_mw",
    "compact_counts_mw",
    "merge_compact_tables_mw",
    "fx_hash_mw",
    "mw_to_numpy",
]

_U32 = jnp.uint32
_I32 = jnp.int32


def n_limbs(K: int, bps: int = 2) -> int:
    return -(-(K * bps) // 32)


@partial(jax.jit, static_argnames=("L", "K", "bps"))
def _window_limbs(words, L: int, K: int, bps: int):
    P = PER_WORD(bps)
    bits = K * bps
    M = n_limbs(K, bps)
    n = L - K + 1
    if n <= 0:
        return tuple(jnp.zeros(0, _U32) for _ in range(M))
    Q = -(-L // P)
    w = [words[j : Q + j] for j in range(M + 1)]
    s = 32 * M - bits  # 0 <= s < 32
    outs = [[] for _ in range(M)]
    for r in range(P):
        o = bps * r
        if o == 0:
            chunks = [w[j] for j in range(M)]
        else:
            chunks = [
                (w[j] << o) | (w[j + 1] >> (32 - o)) for j in range(M)
            ]
        # shift the 32M-bit window right by s into value limbs
        if s == 0:
            limbs = chunks
        else:
            limbs = [chunks[0] >> s] + [
                (chunks[j] >> s) | (chunks[j - 1] << (32 - s))
                for j in range(1, M)
            ]
        for m in range(M):
            outs[m].append(limbs[m])
    return tuple(
        jnp.stack(outs[m], axis=1).reshape(Q * P)[:n] for m in range(M)
    )


def windows_mw(codes, K: int, bps: int = 2):
    """All K-windows as a tuple of M uint32 limb arrays (limb 0 = MSB)."""
    L = codes.shape[0]
    M = n_limbs(K, bps)
    words = pack_words(codes, bps=bps, pad_words=M + 1)
    return _window_limbs(words, L, K, bps)


@partial(jax.jit, static_argnames=("K",))
def rc_windows_mw(codes, K: int):
    """Reverse-complement windows of a 2-bit code stream (two-stream trick)."""
    rc_stream = (codes ^ 3)[::-1]
    limbs = windows_mw(rc_stream, K, bps=2)
    return tuple(x[::-1] for x in limbs)


def _lex_lt_or_eq(a, b):
    """(a < b, a == b) lexicographically over limb tuples."""
    lt = jnp.zeros(a[0].shape, bool)
    eq = jnp.ones(a[0].shape, bool)
    for x, y in zip(a, b):
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt, eq


@partial(jax.jit, static_argnames=("K",))
def canonical_windows_mw(codes, K: int):
    fw = windows_mw(codes, K, bps=2)
    rv = rc_windows_mw(codes, K)
    lt, _ = _lex_lt_or_eq(fw, rv)
    return tuple(jnp.where(lt, f, r) for f, r in zip(fw, rv))


@partial(jax.jit, static_argnames=("key_bits",))
def sort_count_mw(limbs, valid=None, key_bits: int | None = None):
    """Multi-limb :func:`~kmers_tpu.ops.count.sort_count`.

    Returns (uniq_limbs tuple, counts, n_unique); invalid/padding rows
    carry counts of 0 and all-ones limbs.

    ``key_bits`` (static): the register width K * bits_per_symbol.  When
    it is strictly less than 32*M, the all-ones register cannot be a
    valid kmer, so invalid rows are marked by VALUE (the sentinel) and
    the sort drops its explicit invalid-flag operand — sort cost scales
    with operand count, so M keys instead of M+1 saves ~1/(M+1) of the
    dominant stage (25% at K=47's M=3).  When ``key_bits == 32*M``
    (e.g. K=32 nucleotides, K=4/8 amino acids) the flag operand stays:
    a real all-ones register must not be dropped.
    """
    limbs = tuple(limbs)
    n = limbs[0].shape[0]
    M = len(limbs)
    ones = jnp.asarray(0xFFFFFFFF, _U32)
    use_sentinel = valid is None or (
        key_bits is not None and key_bits < 32 * M
    )
    if valid is not None:
        limbs = tuple(jnp.where(valid, x, ones) for x in limbs)
    if use_sentinel:
        # unstable: every operand is a key -> tied elements bit-identical
        slimbs = lax.sort(limbs, num_keys=M, is_stable=False)
        sflag = None
    else:
        flag = (~valid).astype(jnp.uint8)
        sorted_all = lax.sort((flag, *limbs), num_keys=M + 1, is_stable=False)
        sflag, slimbs = sorted_all[0], sorted_all[1:]
    neq = jnp.zeros(n - 1, bool)
    for x in slimbs:
        neq = neq | (x[1:] != x[:-1])
    if sflag is not None:
        neq = neq | (sflag[1:] != sflag[:-1])
    first = jnp.concatenate([jnp.ones(1, bool), neq])
    is_last = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    wcum = jnp.arange(1, n + 1, dtype=_I32)
    start_w = lax.cummax(jnp.where(first, wcum - 1, 0))
    run_total = wcum - start_w
    # sentinel-interspersed emission: each run's last element keeps the
    # kmer and total; no compaction pass (see ops.count module docstring)
    if sflag is not None:
        invalid_row = sflag != 0
    elif valid is None:
        invalid_row = jnp.zeros(n, bool)
    else:
        invalid_row = None
        for x in slimbs:
            s = x == ones
            invalid_row = s if invalid_row is None else invalid_row & s
    emit = is_last & ~invalid_row
    ulimbs = tuple(jnp.where(emit, x, ones) for x in slimbs)
    counts = jnp.where(emit, run_total, 0)
    n_runs = jnp.sum(first.astype(_I32))
    # n_runs counts the invalid group as one run when present (it sorts last)
    n_unique = n_runs - invalid_row[-1].astype(_I32)
    return ulimbs, counts, n_unique


@jax.jit
def compact_counts_mw(ulimbs, cnt):
    """Front-pack the real rows of a sentinel-interspersed multi-limb
    count table — the M-limb :func:`kmers_tpu.ops.count.compact_counts`
    (same gather/scatter-free log-shift passes; real rows are ``cnt > 0``,
    relative order preserved, tail becomes all-ones/zero)."""
    ulimbs = tuple(ulimbs)
    n = ulimbs[0].shape[0]
    ones = jnp.asarray(0xFFFFFFFF, _U32)
    real = cnt > 0
    nreal = (~real).astype(_I32)
    d = jnp.cumsum(nreal) - nreal
    v = real
    xs = (*ulimbs, cnt.astype(_I32))
    k = 0
    while (1 << k) < n:
        s = 1 << k

        def sh(a):
            return jnp.concatenate([a[s:], jnp.zeros(s, a.dtype)])

        d_in = sh(d)
        v_in = sh(v.astype(jnp.int8)).astype(bool)
        take_in = v_in & (((d_in >> k) & 1) == 1)
        stay = v & (((d >> k) & 1) == 0)
        xs = tuple(
            jnp.where(take_in, sh(x), jnp.where(stay, x, jnp.zeros_like(x)))
            for x in xs
        )
        d = jnp.where(take_in, d_in, d)
        v = take_in | stay
        k += 1
    out_limbs = tuple(jnp.where(v, x, ones) for x in xs[:-1])
    return out_limbs, jnp.where(v, xs[-1], 0)


def _rle_mw_weighted(slimbs, weights):
    """Weighted RLE of a pre-sorted multi-limb stream.  Padding rows carry
    weight 0 (they contribute nothing even when they tie with a real
    all-ones register); runs whose total is 0 are emitted as padding."""
    n = slimbs[0].shape[0]
    ones = jnp.asarray(0xFFFFFFFF, _U32)
    neq = jnp.zeros(n - 1, bool)
    for x in slimbs:
        neq = neq | (x[1:] != x[:-1])
    first = jnp.concatenate([jnp.ones(1, bool), neq])
    is_last = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    w = weights.astype(_I32)
    wcum = jnp.cumsum(w)
    start_w = lax.cummax(jnp.where(first, wcum - w, 0))
    run_total = wcum - start_w
    emit = is_last & (run_total > 0)
    ulimbs = tuple(jnp.where(emit, x, ones) for x in slimbs)
    counts = jnp.where(emit, run_total, 0)
    n_unique = jnp.sum(emit.astype(_I32))
    return ulimbs, counts, n_unique


@jax.jit
def merge_compact_tables_mw(limbs_a, cnt_a, limbs_b, cnt_b):
    """Merge two *sorted* compact multi-limb count tables with a single
    bitonic merge network — the M-limb
    :func:`kmers_tpu.ops.count.merge_compact_tables` (the streaming
    accumulator of the K > 31 pipeline: cost tracks the distinct count,
    not the stream length).  Returns (ulimbs, counts, n_unique), compact
    and sorted.  Padding rows are ``cnt == 0`` with all-ones limbs (they
    sort last and cannot corrupt a real all-ones run: weight 0)."""
    limbs_a, limbs_b = tuple(limbs_a), tuple(limbs_b)
    half = 1 << max(
        int(max(limbs_a[0].shape[0], limbs_b[0].shape[0], 1) - 1).bit_length(), 0
    )
    if half >= (1 << 22):
        # big tables: concat + fused-sort + weighted RLE beats the
        # materialized bitonic stage loop (see
        # count.merge_compact_tables and ROUND6F_r04.jsonl)
        limbs = tuple(
            jnp.concatenate([a, b]) for a, b in zip(limbs_a, limbs_b)
        )
        cnt = jnp.concatenate(
            [cnt_a.astype(_I32), cnt_b.astype(_I32)]
        )
        sorted_all = lax.sort(
            (*limbs, cnt), num_keys=len(limbs), is_stable=False
        )
        ul, c, nu = _rle_mw_weighted(sorted_all[:-1], sorted_all[-1])
        ul, c = compact_counts_mw(ul, c)
        return ul, c, nu
    ones = jnp.asarray(0xFFFFFFFF, _U32)

    def pad(limbs, c):
        m = limbs[0].shape[0]
        return (
            tuple(
                jnp.concatenate([x, jnp.full(half - m, ones, _U32)])
                for x in limbs
            ),
            jnp.concatenate([c.astype(_I32), jnp.zeros(half - m, _I32)]),
        )

    la, ca = pad(limbs_a, cnt_a)
    lb, cb = pad(limbs_b, cnt_b)
    xs = tuple(
        jnp.concatenate([a, b[::-1]]) for a, b in zip(la, lb)
    )
    xc = jnp.concatenate([ca, cb[::-1]])
    m = half.bit_length()  # log2(2 * half)
    for k in range(m, 0, -1):
        d = 1 << (k - 1)
        tops = [x.reshape(-1, 2, d)[:, 0] for x in xs]
        bots = [x.reshape(-1, 2, d)[:, 1] for x in xs]
        ct, cb2 = xc.reshape(-1, 2, d)[:, 0], xc.reshape(-1, 2, d)[:, 1]
        lt, eq = _lex_lt_or_eq(tops, bots)
        le = lt | eq
        xs = tuple(
            jnp.stack(
                [jnp.where(le, t, b), jnp.where(le, b, t)], 1
            ).reshape(-1)
            for t, b in zip(tops, bots)
        )
        xc = jnp.stack(
            [jnp.where(le, ct, cb2), jnp.where(le, cb2, ct)], 1
        ).reshape(-1)
    ulimbs, cnt, nu = _rle_mw_weighted(xs, xc)
    ulimbs, cnt = compact_counts_mw(ulimbs, cnt)
    return ulimbs, cnt, nu


def fx_hash_mw(limbs, K: int, bps: int = 2):
    """FxHash of multi-limb registers, bit-exact with the scalar path.

    The scalar hash consumes 64-bit words; with M limbs the head word is
    limb 0 alone when M is odd, else (limb0, limb1), etc.
    """
    limbs = list(limbs)
    M = len(limbs)
    shape = limbs[0].shape
    if M % 2 == 1:
        limbs = [jnp.zeros(shape, _U32)] + limbs
    words = [
        (limbs[2 * j], limbs[2 * j + 1]) for j in range((M + 1) // 2)
    ]
    h = u64.from_scalar(0, shape)
    C = u64.from_scalar(FX_CONSTANT, shape)
    for w in words:
        h = u64.mul(u64.xor(u64.rotl(h, 5), w), C)
    return h


def mw_to_numpy(limbs) -> np.ndarray:
    """Limb tuple -> host-side Python-int array (object dtype for > 64 bits)."""
    arrs = [np.asarray(x, dtype=np.uint64) for x in limbs]
    out = np.zeros(arrs[0].shape, dtype=object)
    for a in arrs:
        out = [(int(o) << 32) | int(v) for o, v in zip(out, a)]
    return np.asarray(out, dtype=object)

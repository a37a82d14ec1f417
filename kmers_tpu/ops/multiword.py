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


@jax.jit
def sort_count_mw(limbs, valid=None):
    """Multi-limb :func:`~kmers_tpu.ops.count.sort_count`.

    Returns (uniq_limbs tuple, counts, n_unique); invalid/padding rows
    carry counts of 0 and all-ones limbs.
    """
    limbs = tuple(limbs)
    n = limbs[0].shape[0]
    M = len(limbs)
    ones = jnp.asarray(0xFFFFFFFF, _U32)
    if valid is None:
        flag = jnp.zeros(n, jnp.uint8)
    else:
        flag = (~valid).astype(jnp.uint8)
        limbs = tuple(jnp.where(valid, x, ones) for x in limbs)
    # unstable: every operand is a key, so tied elements are bit-identical
    sorted_all = lax.sort((flag, *limbs), num_keys=M + 1, is_stable=False)
    sflag, slimbs = sorted_all[0], sorted_all[1:]
    neq = jnp.zeros(n - 1, bool)
    for x in slimbs:
        neq = neq | (x[1:] != x[:-1])
    neq = neq | (sflag[1:] != sflag[:-1])
    first = jnp.concatenate([jnp.ones(1, bool), neq])
    is_last = jnp.concatenate([first[1:], jnp.ones(1, bool)])
    wcum = jnp.arange(1, n + 1, dtype=_I32)
    start_w = lax.cummax(jnp.where(first, wcum - 1, 0))
    run_total = wcum - start_w
    # sentinel-interspersed emission: each run's last element keeps the
    # kmer and total; no compaction pass (see ops.count module docstring)
    emit = is_last & (sflag == 0)
    ulimbs = tuple(jnp.where(emit, x, ones) for x in slimbs)
    counts = jnp.where(emit, run_total, 0)
    n_runs = jnp.sum(first.astype(_I32))
    # n_runs counts the invalid group as one run when present (it sorts last)
    n_unique = n_runs - (sflag[-1] == 1).astype(_I32)
    return ulimbs, counts, n_unique


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

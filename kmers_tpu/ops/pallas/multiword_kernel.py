"""Fused multi-limb canonical-window front-end (K = 32..63).

The M-limb generalization of the transpose-free u32 kernel in
:mod:`.window_kernel`: raw little-endian u32 byte groups in, canonical
K-mer registers out as M uint32 limb planes (limb 0 most significant —
the layout of :mod:`kmers_tpu.ops.multiword`), with classification,
packing, in-register reverse complement, canonical select, and the
invalid/ambiguous byte counters all fused into one VMEM pass.  This is
what makes K > 31 counting first-class on the TPU instead of jnp-only
(the reference handles K = 116 with the same NTuple machinery it uses
for K = 3, /root/reference/src/kmer.jl:32-44).

Layout contract (same relabeling as the u32 kernel): window at base
position ``4 * (tile * V + j) + t`` lands at flat index
``tile * 4V + t * V + j`` in every limb plane — a bijection, so counting
(sort-based, order-agnostic) needs no unpermute.  Invalid windows emit
all-ones limbs; a *canonical* register can never be all-ones (the
canonical select picks ``min(x, rc(x))`` and ``rc`` of all-ones is 0),
so the sentinel is collision-free for every K here — unlike the forward
-window case, which is why :func:`canonical_windows_mw_pallas` only
exists in canonical form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas requires a TPU/Mosaic or interpreter backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

from .window_kernel import _bitrev32, _group8_of_u32, _N_FLAG_GROUP

__all__ = ["canonical_windows_mw_pallas"]

_U32 = jnp.uint32
_SENT = 0xFFFFFFFF


def _shr_limbs(limbs, s: int):
    """Right-shift an M-limb big-endian register by s (0 <= s < 32)."""
    if s == 0:
        return list(limbs)
    out = [limbs[0] >> s]
    for j in range(1, len(limbs)):
        out.append((limbs[j] >> s) | (limbs[j - 1] << (32 - s)))
    return out


def _canonical_mw(limbs, K: int, M: int):
    """Canonical select with in-register reverse complement over M limbs.

    ``limbs``: the forward register in the low 2K bits of the 32M-bit
    limb vector.  Complement = XOR with the 2K-bit coding mask; reverse
    = limb-order swap + per-limb bit reversal + adjacent-bit swap;
    realign = right shift by 32M - 2K.
    """
    bits = 2 * K
    mask = (1 << bits) - 1
    masks = [
        jnp.asarray((mask >> (32 * (M - 1 - m))) & 0xFFFFFFFF, _U32)
        for m in range(M)
    ]
    mA = jnp.asarray(0xAAAAAAAA, _U32)
    mS = jnp.asarray(0x55555555, _U32)
    rev = []
    for m in range(M):
        z = _bitrev32(limbs[M - 1 - m] ^ masks[M - 1 - m])
        z = ((z & mA) >> 1) | ((z & mS) << 1)
        rev.append(z)
    rc = _shr_limbs(rev, 32 * M - bits)
    # lexicographic min over limbs
    lt = None
    eq = None
    for f, r in zip(limbs, rc):
        l_ = f < r
        e_ = f == r
        lt = l_ if lt is None else lt | (eq & l_)
        eq = e_ if eq is None else eq & e_
    fwd_le = lt | eq
    return [jnp.where(fwd_le, f, r) for f, r in zip(limbs, rc)]


def _kernel_mw(
    v_ref, next_ref, *out_and_cnt, K: int, M: int, V: int, interpret: bool
):
    """Transpose-free fused multi-limb front-end (see module docstring).

    A window at byte-group offset needs M+1 full 32-bit packed words =
    4(M+1) byte groups, assembled from lane rolls 1..4M+3 with the next
    tile's first 4M+3 groups as carries ('N' constants on the last
    tile, so tail windows sentinel without any padding copy).
    """
    out_refs, cnt_ref = out_and_cnt[:-1], out_and_cnt[-1]
    pid = pl.program_id(0)
    last_block = pid == pl.num_programs(0) - 1
    g = v_ref[:]  # (1, V)
    p, fp, n_amb, n_bad = _group8_of_u32(g)

    n_carry = 4 * (M + 1) - 1
    carries = []
    for k in range(n_carry):
        cw, cf, _, _ = _group8_of_u32(next_ref[0, k])
        cw = jnp.where(last_block, jnp.asarray(0, _U32), cw)
        cf = jnp.where(last_block, jnp.asarray(_N_FLAG_GROUP, _U32), cf)
        carries.append((cw, cf))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    def roll_left(x, k, carry_vals):
        if interpret:
            r = jnp.roll(x, -k, axis=1)
        else:
            r = pltpu.roll(x, np.int32(V - k), axis=1)
        for i in range(k):
            r = jnp.where(lane == V - k + i, carry_vals[i], r)
        return r

    n_groups = 4 * (M + 1)
    ps = [p] + [
        roll_left(p, k, [c[0] for c in carries]) for k in range(1, n_groups)
    ]
    fs = [fp] + [
        roll_left(fp, k, [c[1] for c in carries]) for k in range(1, n_groups)
    ]

    def words(xs):
        return [
            (xs[4 * w] << 24)
            | (xs[4 * w + 1] << 16)
            | (xs[4 * w + 2] << 8)
            | xs[4 * w + 3]
            for w in range(M + 1)
        ]

    F = words(ps)
    G = words(fs)
    s_out = 32 * M - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for t in range(4):
        sh = 2 * t
        if t == 0:
            raw = F[:M]
            graw = G[:M]
        else:
            raw = [(F[m] << sh) | (F[m + 1] >> (32 - sh)) for m in range(M)]
            graw = [(G[m] << sh) | (G[m + 1] >> (32 - sh)) for m in range(M)]
        limbs = _shr_limbs(raw, s_out)
        glimbs = _shr_limbs(graw, s_out)
        can = _canonical_mw(limbs, K, M)
        bad = None
        for x in glimbs:
            bad = x if bad is None else bad | x
        bad = bad != 0
        for m in range(M):
            out_refs[m][0:1, t * V : (t + 1) * V] = jnp.where(
                bad, sent, can[m]
            )

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tile_counts = jnp.where(
        lane128 == 0,
        jnp.sum(n_bad, dtype=jnp.int32),
        jnp.where(
            lane128 == 1, jnp.sum(n_amb, dtype=jnp.int32), np.int32(0)
        ),
    )

    @pl.when(pid == 0)
    def _():
        cnt_ref[:] = tile_counts

    @pl.when(pid != 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + tile_counts


def canonical_windows_mw_pallas(
    v_u32, K: int, V: int = 4096, interpret: bool = False
):
    """Fused multi-limb canonical front-end over the little-endian u32
    view of the byte stream (same zero-copy host prep as the u32 kernel:
    pad bytes with 'N' to a multiple of 4*V).

    Returns ``(limbs, n_invalid, n_ambig)``: a tuple of M flat uint32
    limb arrays (limb 0 most significant) in the tile-relabeled order,
    all-ones at flagged/tail windows (safe: canonical registers are
    never all-ones), and the byte error counters over all 4*len(v_u32)
    bytes (callers discount their host padding).
    """
    if not 32 <= K <= 63:
        raise ValueError(
            "fused multi-limb canonical windows support 32 <= K <= 63 "
            "(use canonical_windows_u32_pallas for K <= 31)"
        )
    from ..multiword import n_limbs

    M = n_limbs(K)
    n4 = v_u32.shape[0]
    if n4 % V != 0:
        raise ValueError(f"u32 view length {n4} must be a multiple of V={V}")
    grid = n4 // V
    last = grid - 1
    kern = partial(_kernel_mw, K=K, M=M, V=V, interpret=interpret)
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, V),
                lambda i: (0, jnp.minimum(i + 1, last)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * V), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(M)
        ]
        + [
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 4 * n4), _U32) for _ in range(M)
        ]
        + [jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
    )(v_u32.reshape(1, -1), v_u32.reshape(1, -1))
    limbs = tuple(x.reshape(-1) for x in outs[:M])
    cnt = outs[M]
    return limbs, cnt[0, 0], cnt[0, 1]

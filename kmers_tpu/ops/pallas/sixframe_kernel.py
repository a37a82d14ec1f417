"""Fused six-frame amino-acid window extraction Pallas kernel.

One Mosaic pass over the raw little-endian u32 byte view computes, for
every base position p, BOTH strands' amino-acid K-mer registers — the
fusion of the six-frame jnp front-end (``parallel.sixframe._sixframe_fe_body``:
classify + codon build + codon→AA lookup + K stride-3 window rolls + RC
stream, ~11 ms per 2^24-base chunk on v5e) into one VMEM pass.

The six-frame identities that make a single forward pass sufficient
(hot-loop analogue: /root/reference/src/transformations.jl:43-70):

- The union over the three codon frames of one strand is the set of
  windows anchored at EVERY base position (the step-3 identity of
  ``_aa_windows_step3``).
- The reverse-complement codon at rc-stream position q is
  ``revcomp6(cod[n-3-q])`` — a field-reversed complement of the forward
  codon at the same physical bases.  So the reverse strand needs no
  reversed stream: a second 64-entry table ``RC_TBL[c] = TBL[revcomp6(c)]``
  gives the rc amino acid at every FORWARD position, and the rv window
  anchored at forward position p0 is ``sum_j RC_AA[p0+3j] << 8j``
  (earliest rc codon = highest byte = largest forward position).
- Both strands' windows at anchor p0 span bases [p0, p0+3K): ONE
  validity register serves both.

Both tables pack into one 16-bit select tree (``aa_f | aa_rc << 8``), so
the lookup costs one 63-select binary tree per base slot.  Ownership
(which forward anchors this device/chunk emits) arrives as four traced
i32 bounds, applied in-kernel: fw anchors own ``[H, H+b)``; rv anchors
own ``[1, b+1)`` (the image of the rc-stream body span under
p0 = n - 3K - q).  Windows that are unowned or touch a non-ACGTU byte
emit the count sentinel; lane 0 of the counter block accumulates the
number of emitted (valid, owned) windows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .window_kernel import HAVE_PALLAS, _SENT, _group8_of_u32

if HAVE_PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "sixframe_windows_u32_pallas",
    "sixframe_windows_mw_u32_pallas",
    "sixframe_tbl16",
]

_U32 = jnp.uint32
_I32 = jnp.int32


def sixframe_tbl16(tbl_bytes: bytes) -> tuple:
    """Pack a 64-entry codon→AA table into the kernel's 16-bit dual
    table: entry c = ``tbl[c] | tbl[revcomp6(c)] << 8`` (forward AA in
    the low byte, reverse-complement-codon AA in the high byte)."""
    tbl = np.frombuffer(tbl_bytes, np.uint8)
    if tbl.size != 64:
        raise ValueError("codon table must have 64 entries")
    out = []
    for c in range(64):
        b0, b1, b2 = (c >> 4) & 3, (c >> 2) & 3, c & 3
        rc = ((b2 ^ 3) << 4) | ((b1 ^ 3) << 2) | (b0 ^ 3)
        out.append(int(tbl[c]) | (int(tbl[rc]) << 8))
    return tuple(out)


def _tree16(cod, tbl16):
    """64-entry 16-bit lookup as a binary select tree (LSB-first levels);
    the gather-free in-kernel form of ``ops.encode.lookup_bytes``."""
    vals = [jnp.asarray(v, _U32) for v in tbl16]
    for b in range(6):
        m = ((cod >> b) & 1) != 0
        vals = [
            jnp.where(m, vals[2 * i + 1], vals[2 * i])
            for i in range(len(vals) // 2)
        ]
    return vals[0]


def _dual_aa_streams(v_ref, next_ref, V: int, tbl16: tuple, interpret: bool):
    """Shared kernel prologue: byte groups -> boundary-correct dual-AA
    and codon-flag streams for the four byte slots of this tile AND the
    next (the next tile's streams supply the roll carries; on the last
    tile they are substituted with flagged padding).

    Returns ``(aa16, aa16n, cfv, cfvn, rolled, lane)`` where ``rolled``
    rolls any of these streams left by d across the tile boundary."""
    pid = pl.program_id(0)
    last_block = pid == pl.num_programs(0) - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    p8, f8, _, _ = _group8_of_u32(v_ref[:])
    p8n, f8n, _, _ = _group8_of_u32(next_ref[:])
    p8n = jnp.where(last_block, jnp.asarray(0, _U32), p8n)
    f8n = jnp.where(last_block, jnp.asarray(0xFF, _U32), f8n)

    def rolled(this, nxt, d):
        """Roll-left-by-d across the tile boundary: lanes < V-d from this
        tile, the last d lanes from the next tile's first lanes."""
        if d == 0:
            return this
        if interpret:
            a = jnp.roll(this, -d, axis=1)
            b = jnp.roll(nxt, -d, axis=1)
        else:
            a = pltpu.roll(this, np.int32(V - d), axis=1)
            b = pltpu.roll(nxt, np.int32(V - d), axis=1)
        return jnp.where(lane < V - d, a, b)

    # 16-base double groups: base u (0..7) of (group j, group j+1) at
    # bits 14-2u; the codon at byte slot t is bits (14-2t)..(10-2t).
    # g2n's last lane wraps into tile i+2 — only its first lanes are
    # ever selected by ``rolled`` (d <= 3K//4 <= 24), so that is benign.
    def ring1(x):
        return jnp.roll(x, -1, axis=1) if interpret else pltpu.roll(
            x, np.int32(V - 1), axis=1
        )

    g2 = (p8 << 8) | rolled(p8, p8n, 1)
    fg2 = (f8 << 8) | rolled(f8, f8n, 1)
    g2n = (p8n << 8) | ring1(p8n)
    fg2n = (f8n << 8) | ring1(f8n)

    aa16, aa16n, cfv, cfvn = [], [], [], []
    m63 = jnp.asarray(63, _U32)
    for t in range(4):
        sh = 10 - 2 * t
        aa16.append(_tree16((g2 >> sh) & m63, tbl16))
        aa16n.append(_tree16((g2n >> sh) & m63, tbl16))
        cfv.append((fg2 >> sh) & m63)
        cfvn.append((fg2n >> sh) & m63)
    return aa16, aa16n, cfv, cfvn, rolled, lane


def _accum_cnt(cnt_ref, nv):
    """Shared kernel epilogue: accumulate this tile's valid-window count
    into lane 0 of the counter block (TPU grid steps run sequentially).
    dtype pinned to int32: under jax_enable_x64 an unpinned sum would
    accumulate in int64, which Mosaic cannot lower."""
    pid = pl.program_id(0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tile_counts = jnp.where(lane128 == 0, nv, np.int32(0))

    @pl.when(pid == 0)
    def _():
        cnt_ref[:] = tile_counts

    @pl.when(pid != 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + tile_counts


def _kernel_sixframe(
    v_ref, next_ref, bounds_ref, hi_ref, lo_ref, cnt_ref,
    *, K: int, V: int, tbl16: tuple, interpret: bool,
):
    pid = pl.program_id(0)
    aa16, aa16n, cfv, cfvn, rolled, lane = _dual_aa_streams(
        v_ref, next_ref, V, tbl16, interpret
    )

    zeros = lambda: jnp.zeros((1, V), _U32)
    fhi = [zeros() for _ in range(4)]
    flo = [zeros() for _ in range(4)]
    rhi = [zeros() for _ in range(4)]
    rlo = [zeros() for _ in range(4)]
    bad = [zeros() for _ in range(4)]
    m8 = jnp.asarray(0xFF, _U32)

    # one pass over the 3K+1 forward byte offsets; each rolled AA/flag
    # stream feeds every anchor slot t0 whose window has a codon there
    for o in range(3 * K + 1):
        d, tp = divmod(o, 4)
        aa = rolled(aa16[tp], aa16n[tp], d)
        cf = rolled(cfv[tp], cfvn[tp], d)
        aaF = aa & m8
        aaR = aa >> 8
        for t0 in (o % 3, o % 3 + 3):
            if t0 > 3:
                continue
            k = (o - t0) // 3
            if not 0 <= k < K:
                continue
            j = K - 1 - k  # fw byte index (earliest codon highest byte)
            if j < 4:
                flo[t0] = flo[t0] | (aaF << (8 * j))
            else:
                fhi[t0] = fhi[t0] | (aaF << (8 * (j - 4)))
            if k < 4:
                rlo[t0] = rlo[t0] | (aaR << (8 * k))
            else:
                rhi[t0] = rhi[t0] | (aaR << (8 * (k - 4)))
            bad[t0] = bad[t0] | cf

    b_flo = bounds_ref[0, 0]
    b_fhi = bounds_ref[0, 1]
    b_rlo = bounds_ref[0, 2]
    b_rhi = bounds_ref[0, 3]
    sent = jnp.asarray(_SENT, _U32)
    nv = None
    for t0 in range(4):
        pos = 4 * (pid * V + lane) + t0
        okw = bad[t0] == 0
        emit_f = okw & (pos >= b_flo) & (pos < b_fhi)
        emit_r = okw & (pos >= b_rlo) & (pos < b_rhi)
        hi_ref[0:1, t0 * V : (t0 + 1) * V] = jnp.where(emit_f, fhi[t0], sent)
        lo_ref[0:1, t0 * V : (t0 + 1) * V] = jnp.where(emit_f, flo[t0], sent)
        hi_ref[0:1, (4 + t0) * V : (5 + t0) * V] = jnp.where(
            emit_r, rhi[t0], sent
        )
        lo_ref[0:1, (4 + t0) * V : (5 + t0) * V] = jnp.where(
            emit_r, rlo[t0], sent
        )
        t_nv = jnp.sum(emit_f.astype(jnp.int32), dtype=jnp.int32) + jnp.sum(
            emit_r.astype(jnp.int32), dtype=jnp.int32
        )
        nv = t_nv if nv is None else nv + t_nv

    _accum_cnt(cnt_ref, nv)


def sixframe_windows_u32_pallas(
    v_u32, bounds_i32, K: int, V: int = 4096, interpret: bool = False,
    tbl16: tuple | None = None,
):
    """Six-frame AA window registers over the u32 view of a byte row.

    ``v_u32``: little-endian u32 view of the padded row (length a
    multiple of ``V``).  ``bounds_i32``: (128,) i32 whose first four
    lanes are the traced ownership bounds
    ``[fw_lo, fw_hi, rv_lo, rv_hi)`` in forward byte coordinates.
    ``tbl16``: :func:`sixframe_tbl16` of the genetic code (static).

    Returns ``(hi, lo, n_valid)``: flat uint32 streams of length
    ``8 * len(v_u32)`` holding, for tile i, the four fw anchor slots then
    the four rv anchor slots (order is irrelevant — a sort follows);
    unowned/invalid windows are the count sentinel, and ``n_valid`` is
    the number of non-sentinel windows.
    """
    if not 1 <= K <= 7:
        raise ValueError("fused six-frame windows support 1 <= K <= 7")
    if tbl16 is None:
        raise ValueError("tbl16 (sixframe_tbl16 of the codon table) required")
    n4 = v_u32.shape[0]
    if n4 % V != 0:
        raise ValueError(f"u32 view length {n4} must be a multiple of V={V}")
    grid = n4 // V
    last = grid - 1
    kern = partial(
        _kernel_sixframe, K=K, V=V, tbl16=tuple(tbl16), interpret=interpret
    )
    hi, lo, cnt = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, V),
                lambda i: (0, jnp.minimum(i + 1, last)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8 * V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 * V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 8 * n4), _U32),
            jax.ShapeDtypeStruct((1, 8 * n4), _U32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(v_u32.reshape(1, -1), v_u32.reshape(1, -1), bounds_i32.reshape(1, -1))
    return hi.reshape(-1), lo.reshape(-1), cnt[0, 0]


def _kernel_sixframe_mw(
    v_ref, next_ref, bounds_ref, *rest,
    K: int, V: int, M: int, tbl16: tuple, interpret: bool,
):
    """Multi-limb twin of :func:`_kernel_sixframe` for 8 <= K <= 32
    amino acids (M = ceil(8K/32) big-endian uint32 limbs per window).

    Identical structure — forward-coordinates dual-strand AA streams,
    per-o rolled accumulation, in-kernel ownership — but windows emit as
    M limb streams plus an EXPLICIT validity stream: at K = 4m the
    register fills 32*M bits exactly, so an all-ones sentinel could
    collide with a real window (the same reason ``sort_count_mw`` keeps
    its flag operand at those widths)."""
    limb_refs = rest[:M]
    valid_ref = rest[M]
    cnt_ref = rest[M + 1]
    pid = pl.program_id(0)
    aa16, aa16n, cfv, cfvn, rolled, lane = _dual_aa_streams(
        v_ref, next_ref, V, tbl16, interpret
    )

    zeros = lambda: jnp.zeros((1, V), _U32)
    fw = [[zeros() for _ in range(M)] for _ in range(4)]
    rv = [[zeros() for _ in range(M)] for _ in range(4)]
    bad = [zeros() for _ in range(4)]
    m8 = jnp.asarray(0xFF, _U32)

    for o in range(3 * K + 1):
        d, tp = divmod(o, 4)
        aa = rolled(aa16[tp], aa16n[tp], d)
        cf = rolled(cfv[tp], cfvn[tp], d)
        aaF = aa & m8
        aaR = aa >> 8
        for t0 in (o % 3, o % 3 + 3):
            if t0 > 3:
                continue
            k = (o - t0) // 3
            if not 0 <= k < K:
                continue
            j = K - 1 - k  # fw byte index (0 = LSB; earliest codon highest)
            fw[t0][M - 1 - j // 4] = fw[t0][M - 1 - j // 4] | (
                aaF << (8 * (j % 4))
            )
            rv[t0][M - 1 - k // 4] = rv[t0][M - 1 - k // 4] | (
                aaR << (8 * (k % 4))
            )
            bad[t0] = bad[t0] | cf

    b_flo = bounds_ref[0, 0]
    b_fhi = bounds_ref[0, 1]
    b_rlo = bounds_ref[0, 2]
    b_rhi = bounds_ref[0, 3]
    one = jnp.asarray(1, _U32)
    zero = jnp.asarray(0, _U32)
    nv = None
    for t0 in range(4):
        pos = 4 * (pid * V + lane) + t0
        okw = bad[t0] == 0
        emit_f = okw & (pos >= b_flo) & (pos < b_fhi)
        emit_r = okw & (pos >= b_rlo) & (pos < b_rhi)
        for m in range(M):
            limb_refs[m][0:1, t0 * V : (t0 + 1) * V] = jnp.where(
                emit_f, fw[t0][m], zero
            )
            limb_refs[m][0:1, (4 + t0) * V : (5 + t0) * V] = jnp.where(
                emit_r, rv[t0][m], zero
            )
        valid_ref[0:1, t0 * V : (t0 + 1) * V] = jnp.where(emit_f, one, zero)
        valid_ref[0:1, (4 + t0) * V : (5 + t0) * V] = jnp.where(
            emit_r, one, zero
        )
        t_nv = jnp.sum(emit_f.astype(jnp.int32), dtype=jnp.int32) + jnp.sum(
            emit_r.astype(jnp.int32), dtype=jnp.int32
        )
        nv = t_nv if nv is None else nv + t_nv

    _accum_cnt(cnt_ref, nv)


def sixframe_windows_mw_u32_pallas(
    v_u32, bounds_i32, K: int, V: int = 4096, interpret: bool = False,
    tbl16: tuple | None = None,
):
    """Multi-limb six-frame AA window registers (8 <= K <= 32 amino
    acids) over the u32 view of a byte row; same contract as
    :func:`sixframe_windows_u32_pallas` but returns
    ``(limbs tuple, valid, n_valid)`` — M big-endian uint32 limb streams
    of length ``8 * len(v_u32)`` plus an explicit uint32 validity stream
    (1 = owned and unambiguous), for ``sort_count_mw``'s flag operand."""
    if not 8 <= K <= 32:
        raise ValueError("fused multi-limb six-frame windows support 8 <= K <= 32")
    if tbl16 is None:
        raise ValueError("tbl16 (sixframe_tbl16 of the codon table) required")
    M = -(-8 * K // 32)
    n4 = v_u32.shape[0]
    if n4 % V != 0:
        raise ValueError(f"u32 view length {n4} must be a multiple of V={V}")
    grid = n4 // V
    last = grid - 1
    kern = partial(
        _kernel_sixframe_mw, K=K, V=V, M=M, tbl16=tuple(tbl16),
        interpret=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, V),
                lambda i: (0, jnp.minimum(i + 1, last)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8 * V), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(M + 1)
        ]
        + [pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((1, 8 * n4), _U32) for _ in range(M + 1)
        ]
        + [jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        interpret=interpret,
    )(v_u32.reshape(1, -1), v_u32.reshape(1, -1), bounds_i32.reshape(1, -1))
    limbs = tuple(x.reshape(-1) for x in out[:M])
    valid = out[M].reshape(-1)
    return limbs, valid, out[M + 1][0, 0]

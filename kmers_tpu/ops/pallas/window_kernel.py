"""Fused canonical-window extraction Pallas kernel.

Computes, for every position of a packed 2-bit base stream, the canonical
(min of forward and reverse-complement) K-mer register — the fusion of
``windows_from_codes`` + ``rc_windows_from_codes`` + ``u64.minimum``
(SURVEY.md §7 M2's "one kernel").  Differences from the jnp path:

- the reverse complement is computed *in-register* per window (complement
  XOR + 64-bit bit-reversal + adjacent-bit swap) instead of via a second
  reversed stream — halving HBM reads;
- outputs are in offset-major layout ``(16, Q)`` where window position
  ``i = 16*q + r`` lives at ``[r, q]`` — the natural vector layout for
  the 16 sub-word offsets, avoiding any in-kernel transpose.  Counting is
  order-agnostic (a sort follows); order-sensitive consumers use
  :func:`linearize_offset_major`.

Mosaic-shaped: all values live as (1, W) / (16, W) lane vectors, word
adjacency comes from ``pltpu.roll`` along lanes plus a precomputed
2-word carry per tile (the cross-tile analogue of the reference's
``leftshift_carry``, /root/reference/src/tuple_bitflipping.jl:24-46).
~70 uint32 VPU ops per window; no gathers, no MXU, no relayouts.
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

__all__ = [
    "canonical_windows_pallas",
    "canonical_windows_masked_pallas",
    "canonical_windows_bytes_pallas",
    "canonical_windows_bytes_flat_pallas",
    "canonical_hash_bytes_pallas",
    "linearize_offset_major",
    "HAVE_PALLAS",
]

#: sentinel emitted for invalid windows by the masked kernel (matches
#: kmers_tpu.ops.count.SENTINEL in both limbs)
_SENT = 0xFFFFFFFF

_U32 = jnp.uint32


def _bitrev32(y):
    m1 = jnp.asarray(0x55555555, _U32)
    m2 = jnp.asarray(0x33333333, _U32)
    m4 = jnp.asarray(0x0F0F0F0F, _U32)
    m8 = jnp.asarray(0x00FF00FF, _U32)
    y = ((y >> 1) & m1) | ((y & m1) << 1)
    y = ((y >> 2) & m2) | ((y & m2) << 2)
    y = ((y >> 4) & m4) | ((y & m4) << 4)
    y = ((y >> 8) & m8) | ((y & m8) << 8)
    return (y >> 16) | (y << 16)


def _shr64(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    return jnp.zeros_like(hi), hi >> (s - 32)


def _adjacent(words_ref, next_ref, W: int, interpret: bool):
    """(w, w+1, w+2) lane vectors of a tile, with cross-tile carry."""
    return _adjacent_vec(words_ref[:], next_ref[0, 0], next_ref[0, 1], W, interpret)


def _adjacent_vec(wa, c0, c1, W: int, interpret: bool):
    """Like :func:`_adjacent` on an in-register (1, W) word vector with
    scalar cross-tile carries ``c0``/``c1``."""
    if interpret:
        w1 = jnp.roll(wa, -1, axis=1)
        w2 = jnp.roll(wa, -2, axis=1)
    else:
        # pltpu.roll requires non-negative shifts; left-by-k == right-by-(W-k).
        # np.int32 shift: a Python-int literal becomes i64 under x64 mode,
        # which Mosaic cannot lower.
        w1 = pltpu.roll(wa, np.int32(W - 1), axis=1)
        w2 = pltpu.roll(wa, np.int32(W - 2), axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    w1 = jnp.where(lane == W - 1, c0, w1)
    w2 = jnp.where(lane == W - 2, c0, jnp.where(lane == W - 1, c1, w2))
    return wa, w1, w2


def _window_value(wa, w1, w2, o: int, s_out: int):
    """Register value (fh, fl) of the window at sub-word bit offset o."""
    if o == 0:
        hi_full, lo_full = wa, w1
    else:
        hi_full = (wa << o) | (w1 >> (32 - o))
        lo_full = (w1 << o) | (w2 >> (32 - o))
    return _shr64(hi_full, lo_full, s_out)


def _canonical(fh, fl, K: int, s_out: int):
    """Canonical select with in-register reverse complement: complement
    (XOR coding mask), 64-bit bit reversal (word swap + per-word bitrev),
    adjacent-bit swap, realign to the low bits."""
    mask_hi = jnp.asarray(((1 << (2 * K)) - 1) >> 32, _U32)
    mask_lo = jnp.asarray(((1 << (2 * K)) - 1) & 0xFFFFFFFF, _U32)
    mA = jnp.asarray(0xAAAAAAAA, _U32)
    mS = jnp.asarray(0x55555555, _U32)
    zh = _bitrev32(fl ^ mask_lo)
    zl = _bitrev32(fh ^ mask_hi)
    zh = ((zh & mA) >> 1) | ((zh & mS) << 1)
    zl = ((zl & mA) >> 1) | ((zl & mS) << 1)
    rh, rl = _shr64(zh, zl, s_out)
    fwd_le = (fh < rh) | ((fh == rh) & (fl <= rl))
    return jnp.where(fwd_le, fh, rh), jnp.where(fwd_le, fl, rl)


def _kernel(words_ref, next_ref, hi_ref, lo_ref, *, K: int, W: int, interpret: bool):
    wa, w1, w2 = _adjacent(words_ref, next_ref, W, interpret)
    s_out = 64 - 2 * K
    for r in range(16):
        fh, fl = _window_value(wa, w1, w2, 2 * r, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        hi_ref[r : r + 1, :] = ch
        lo_ref[r : r + 1, :] = cl


def _fx_mul(hi, lo):
    """Low 64 bits of register * FX_CONSTANT in uint32 lanes (the whole
    FxHash of a single-word kmer with seed 0 — see ops/hashing.py)."""
    from ...kmer import FX_CONSTANT

    b_hi = jnp.asarray(FX_CONSTANT >> 32, _U32)
    b_lo = jnp.asarray(FX_CONSTANT & 0xFFFFFFFF, _U32)
    al = lo & 0xFFFF
    ah = lo >> 16
    bl = b_lo & 0xFFFF
    bh = b_lo >> 16
    p0 = al * bl
    p1 = al * bh
    p2 = ah * bl
    p3 = ah * bh
    lo1 = p0 + (p1 << 16)
    c1 = (lo1 < p0).astype(_U32)
    out_lo = lo1 + (p2 << 16)
    c2 = (out_lo < lo1).astype(_U32)
    h0 = p3 + (p1 >> 16) + (p2 >> 16) + c1 + c2
    out_hi = h0 + lo * b_hi + hi * b_lo
    return out_hi, out_lo


def _kernel_masked_hash(
    words_ref, next_ref, flags_ref, fnext_ref, hh_ref, hl_ref,
    *, K: int, W: int, interpret: bool,
):
    """Canonical windows -> FxHash directly (for minhash/minimizer
    pipelines); invalid windows emit all-ones hashes (sort last)."""
    wa, w1, w2 = _adjacent(words_ref, next_ref, W, interpret)
    fa, f1, f2 = _adjacent(flags_ref, fnext_ref, W, interpret)
    s_out = 64 - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for r in range(16):
        fh, fl = _window_value(wa, w1, w2, 2 * r, s_out)
        gh, gl = _window_value(fa, f1, f2, 2 * r, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        hh, hl = _fx_mul(ch, cl)
        bad = (gh | gl) != 0
        hh_ref[r : r + 1, :] = jnp.where(bad, sent, hh)
        hl_ref[r : r + 1, :] = jnp.where(bad, sent, hl)


def _kernel_masked(
    words_ref, next_ref, flags_ref, fnext_ref, hi_ref, lo_ref,
    *, K: int, W: int, interpret: bool,
):
    """Masked variant: a second packed stream carries 0b11 at bad bases;
    a window whose flag register is nonzero emits the count sentinel."""
    wa, w1, w2 = _adjacent(words_ref, next_ref, W, interpret)
    fa, f1, f2 = _adjacent(flags_ref, fnext_ref, W, interpret)
    s_out = 64 - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for r in range(16):
        fh, fl = _window_value(wa, w1, w2, 2 * r, s_out)
        gh, gl = _window_value(fa, f1, f2, 2 * r, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        bad = (gh | gl) != 0
        hi_ref[r : r + 1, :] = jnp.where(bad, sent, ch)
        lo_ref[r : r + 1, :] = jnp.where(bad, sent, cl)


def _classify_byte(b):
    """ASCII byte -> (2-bit code, 2-bit flag): the in-kernel form of
    ``ops.encode.classify_2bit`` for the skip-ambiguous canonical path.
    The code is the ``((b>>1) ^ (b>>2)) & 3`` identity on A/C/G/T/U (either
    case); the flag is 0 for a certain base and 0b11 otherwise (ambiguous,
    invalid, or padding — all sentinel the windows that contain them,
    matching the 0xf0/0xff classes of ASCII_SKIPPING_LUT,
    /root/reference/src/iterators/common.jl:22-32)."""
    three = jnp.asarray(3, _U32)
    c = ((b >> 1) ^ (b >> 2)) & three
    up = b & jnp.asarray(0xDF, _U32)  # fold ASCII case
    cert = (
        (up == 65) | (up == 67) | (up == 71) | (up == 84) | (up == 85)
    )  # A C G T U
    return c, jnp.where(cert, jnp.asarray(0, _U32), three)


def _is_ambiguous_byte(b, up):
    """IUPAC ambiguity/gap class of ASCII_SKIPPING_LUT (0xf0 sentinel:
    ``-MRSVWYHKDBN`` both cases, /root/reference/src/iterators/common.jl:26-31)."""
    amb = b == 0x2D  # '-'
    for ch in b"MRSVWYHKDBN":
        amb = amb | (up == ch)
    return amb


def _classify_pack16(get_u32, want_counts: bool = False):
    """Pack 16 bases from four little-endian u32 byte groups into one
    big-endian 2-bit word (+ matching flag word).  ``get_u32(s)`` yields
    the u32 holding bytes 4s..4s+3; base j = 4s+t sits at bits 30-2j of
    the packed word (the register layout of pack_words / kmer.jl:33-44).

    With ``want_counts`` also returns per-lane (n_ambiguous, n_invalid)
    byte counts — the in-kernel replacement for a separate classify pass.
    """
    word = None
    fword = None
    n_amb = n_bad = None
    mask = jnp.asarray(0xFF, _U32)
    for s in range(4):
        g = get_u32(s)
        for t in range(4):
            b = (g >> (8 * t)) & mask
            c, f = _classify_byte(b)
            sh = 30 - 2 * (4 * s + t)
            wc = c << sh
            fc = f << sh
            word = wc if word is None else word | wc
            fword = fc if fword is None else fword | fc
            if want_counts:
                up = b & jnp.asarray(0xDF, _U32)
                amb = _is_ambiguous_byte(b, up)
                flagged = f != 0
                a32 = amb.astype(jnp.int32)
                i32 = (flagged & ~amb).astype(jnp.int32)
                n_amb = a32 if n_amb is None else n_amb + a32
                n_bad = i32 if n_bad is None else n_bad + i32
    if want_counts:
        return word, fword, n_amb, n_bad
    return word, fword


def _kernel_bytes(
    bytes_ref, next_ref, hi_ref, lo_ref, *, K: int, W: int, interpret: bool,
    emit_hash: bool,
):
    """Fully fused front-end: raw ASCII bytes -> classify -> pack ->
    windows -> in-register RC -> canonical (-> FxHash) -> sentinel, in one
    VMEM pass.  ``bytes_ref`` is (4, W) u32: lane q holds the 16 bytes of
    packed word q as four little-endian u32 groups (rows).  Cross-tile
    carry words are rebuilt from the next tile's first two lanes on the
    scalar core."""
    word, fword = _classify_pack16(lambda s: bytes_ref[s : s + 1, :])
    carries = []
    for lane in (0, 1):
        cw, cf = _classify_pack16(lambda s: next_ref[s, lane])
        carries.append((cw, cf))
    (c0, f0), (c1, f1) = carries
    wa, w1, w2 = _adjacent_vec(word, c0, c1, W, interpret)
    fa, fb, fc = _adjacent_vec(fword, f0, f1, W, interpret)
    s_out = 64 - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for r in range(16):
        fh, fl = _window_value(wa, w1, w2, 2 * r, s_out)
        gh, gl = _window_value(fa, fb, fc, 2 * r, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        if emit_hash:
            ch, cl = _fx_mul(ch, cl)
        bad = (gh | gl) != 0
        hi_ref[r : r + 1, :] = jnp.where(bad, sent, ch)
        lo_ref[r : r + 1, :] = jnp.where(bad, sent, cl)


def _kernel_bytes_counts(
    bytes_ref, next_ref, hi_ref, lo_ref, cnt_ref,
    *, K: int, W: int, interpret: bool, emit_hash: bool,
):
    """Flat-output fused front-end that also accumulates the pipeline's
    error counters: cnt_ref is a (1, 128) i32 block shared by every grid
    step (TPU grid steps run sequentially); lane 0 accumulates invalid
    bytes, lane 1 ambiguous bytes, over each tile's own 16*W bytes."""
    word, fword, n_amb, n_bad = _classify_pack16(
        lambda s: bytes_ref[s : s + 1, :], want_counts=True
    )
    carries = []
    for lane in (0, 1):
        cw, cf = _classify_pack16(lambda s: next_ref[s, lane])
        carries.append((cw, cf))
    (c0, f0), (c1, f1) = carries
    wa, w1, w2 = _adjacent_vec(word, c0, c1, W, interpret)
    fa, fb, fc = _adjacent_vec(fword, f0, f1, W, interpret)
    s_out = 64 - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for r in range(16):
        fh, fl = _window_value(wa, w1, w2, 2 * r, s_out)
        gh, gl = _window_value(fa, fb, fc, 2 * r, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        if emit_hash:
            ch, cl = _fx_mul(ch, cl)
        bad = (gh | gl) != 0
        hi_ref[0:1, r * W : (r + 1) * W] = jnp.where(bad, sent, ch)
        lo_ref[0:1, r * W : (r + 1) * W] = jnp.where(bad, sent, cl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # dtype pinned: under jax_enable_x64 an unpinned sum accumulates in
    # int64, which Mosaic cannot lower
    tile_bad = jnp.sum(n_bad, dtype=jnp.int32)
    tile_amb = jnp.sum(n_amb, dtype=jnp.int32)
    tile_counts = jnp.where(
        lane == 0, tile_bad, jnp.where(lane == 1, tile_amb, np.int32(0))
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        cnt_ref[:] = tile_counts

    @pl.when(pl.program_id(0) != 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + tile_counts


def canonical_windows_bytes_flat_pallas(
    bytes_u8, K: int, W: int = 4096, interpret: bool = False,
    emit_hash: bool = False,
):
    """Fused front-end with flat (n,) outputs and in-kernel error counts.

    Returns ``(hi, lo, n_invalid, n_ambig)``: hi/lo are 1-D uint32 arrays
    holding every window register exactly once in a tile-local
    relabeled order (bijective; counting is order-agnostic — the
    (16, W)-offset-major (r, q) entry lands at flat index
    tile*16W + r*W + q).  Out-of-range / flagged windows are the count
    sentinel.  ``n_invalid``/``n_ambig`` count non-ACGTU bytes over the
    padded stream; the caller discounts padding ('N' = ambiguous class,
    16*ceil(ceil(L/16)/W)*W + 16*W - L bytes of it).

    Writing the flat layout directly makes the downstream 1-D view free —
    a separate (16, Q) -> (16Q,) reshape measured 14 ms of pure relayout
    at 2^26 — and the fused counters replace an 11 ms classify pass.
    """
    if not 1 <= K <= 31:
        raise ValueError("fused byte canonical windows support 1 <= K <= 31")
    from jax import lax

    L = bytes_u8.shape[0]
    Qreal = max(-(-L // 16), 1)
    grid = max(-(-Qreal // W), 1)
    total = 16 * (grid + 1) * W
    padded = jnp.full(total, ord("N"), jnp.uint8).at[:L].set(bytes_u8)
    u32v = lax.bitcast_convert_type(padded.reshape(-1, 4), _U32)
    cols = u32v.reshape(-1, 4).T  # (4, (grid+1) * W), lane q = word q
    kern = partial(
        _kernel_bytes_counts, K=K, W=W, interpret=interpret,
        emit_hash=emit_hash,
    )
    hi, lo, cnt = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, W), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 16 * W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 * W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 16 * grid * W), _U32),
            jax.ShapeDtypeStruct((1, 16 * grid * W), _U32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(cols, cols)
    # padding bytes inside the counted grid tiles are all 'N' (ambiguous)
    pad_in_grid = 16 * grid * W - L
    n_bad = cnt[0, 0]
    n_amb = cnt[0, 1] - pad_in_grid
    return hi.reshape(-1), lo.reshape(-1), n_bad, n_amb


def _group8_of_u32(g):
    """One u32 of 4 little-endian ASCII bytes -> (8-bit packed 2-bit
    codes, 8-bit packed flags, n_ambiguous, n_invalid).  Byte t is base
    4j+t; its code lands at bits (6-2t) (big-endian base order within
    the group, matching the register layout)."""
    word = None
    fword = None
    n_amb = n_bad = None
    mask = jnp.asarray(0xFF, _U32)
    for t in range(4):
        b = (g >> (8 * t)) & mask
        c, f = _classify_byte(b)
        sh = 6 - 2 * t
        wc = c << sh
        fc = f << sh
        word = wc if word is None else word | wc
        fword = fc if fword is None else fword | fc
        up = b & jnp.asarray(0xDF, _U32)
        amb = _is_ambiguous_byte(b, up)
        a32 = amb.astype(jnp.int32)
        i32 = ((f != 0) & ~amb).astype(jnp.int32)
        n_amb = a32 if n_amb is None else n_amb + a32
        n_bad = i32 if n_bad is None else n_bad + i32
    return word, fword, n_amb, n_bad


#: packed flag group of four 'N' bytes (flag 3 at each of 4 positions)
_N_FLAG_GROUP = 0xFF


def _kernel_u32(
    v_ref, next_ref, hi_ref, lo_ref, cnt_ref,
    *, K: int, V: int, interpret: bool, emit_hash: bool,
):
    """Transpose-free fused front-end over the raw little-endian u32 view
    of the byte stream: lane j holds bytes 4j..4j+3 (4 bases), packed
    in-kernel to an 8-bit code group + 8-bit flag group; a 64-bit window
    at base position 4j+t is assembled from groups j..j+8 via 8 lane
    rolls.  Eliminates the (4, W) transpose (~14 ms) and the device-side
    bitcast (~11 ms) of the byte launcher at 2^26.

    Outputs are flat (1, 4V) rows per tile: position 4*(tile*V + j) + t
    lands at flat index tile*4V + t*V + j (bijective relabeling).  The
    final tile's carry groups are 'N' constants, so tail windows
    sentinel without any padding copy.
    """
    pid = pl.program_id(0)
    last_block = pid == pl.num_programs(0) - 1
    g = v_ref[:]  # (1, V)
    p, fp, n_amb, n_bad = _group8_of_u32(g)

    # next-tile carry groups 0..7 (scalar core); 'N' groups on the last
    # tile (next_ref is clamped there and must not be read as data)
    carries = []
    for k in range(8):
        cw, cf, _, _ = _group8_of_u32(next_ref[0, k])
        cw = jnp.where(last_block, jnp.asarray(0, _U32), cw)
        cf = jnp.where(last_block, jnp.asarray(_N_FLAG_GROUP, _U32), cf)
        carries.append((cw, cf))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    def roll_left(x, k, carry_vals):
        if interpret:
            r = jnp.roll(x, -k, axis=1)
        else:
            r = pltpu.roll(x, np.int32(V - k), axis=1)  # i32: x64-safe
        for i in range(k):
            r = jnp.where(lane == V - k + i, carry_vals[i], r)
        return r

    ps = [p] + [roll_left(p, k, [c[0] for c in carries]) for k in range(1, 9)]
    fs = [fp] + [roll_left(fp, k, [c[1] for c in carries]) for k in range(1, 9)]

    def asm(xs):
        A = (xs[0] << 24) | (xs[1] << 16) | (xs[2] << 8) | xs[3]
        B = (xs[4] << 24) | (xs[5] << 16) | (xs[6] << 8) | xs[7]
        return A, B, xs[8]

    A, B, C = asm(ps)
    FA, FB, FC = asm(fs)
    s_out = 64 - 2 * K
    sent = jnp.asarray(_SENT, _U32)
    for t in range(4):
        sh = 2 * t
        if t == 0:
            hf, lf, hg, lg = A, B, FA, FB
        else:
            hf = (A << sh) | (B >> (32 - sh))
            lf = (B << sh) | (C >> (8 - sh))
            hg = (FA << sh) | (FB >> (32 - sh))
            lg = (FB << sh) | (FC >> (8 - sh))
        fh, fl = _shr64(hf, lf, s_out)
        gh, gl = _shr64(hg, lg, s_out)
        ch, cl = _canonical(fh, fl, K, s_out)
        if emit_hash:
            ch, cl = _fx_mul(ch, cl)
        bad = (gh | gl) != 0
        hi_ref[0:1, t * V : (t + 1) * V] = jnp.where(bad, sent, ch)
        lo_ref[0:1, t * V : (t + 1) * V] = jnp.where(bad, sent, cl)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tile_counts = jnp.where(
        lane128 == 0,
        jnp.sum(n_bad, dtype=jnp.int32),  # dtype pinned for x64 mode
        jnp.where(lane128 == 1, jnp.sum(n_amb, dtype=jnp.int32), np.int32(0)),
    )

    @pl.when(pid == 0)
    def _():
        cnt_ref[:] = tile_counts

    @pl.when(pid != 0)
    def _():
        cnt_ref[:] = cnt_ref[:] + tile_counts


def canonical_windows_u32_pallas(
    v_u32, K: int, V: int = 4096, interpret: bool = False,
    emit_hash: bool = False,
):
    """Fused front-end over the host-side little-endian u32 view of the
    byte stream (``np.frombuffer(bytes, '<u4')`` — zero-copy on the
    host, no device-side bitcast/transpose/pad).

    ``v_u32.shape[0]`` must be a multiple of ``V`` (callers pad the byte
    chunk with 'N' to a multiple of 4*V on the host).  Returns
    ``(hi, lo, n_invalid, n_ambig)``: flat uint32 window registers in the
    tile-relabeled order (bijective; counting is order-agnostic), the
    count sentinel at flagged/tail windows, and the byte error counters
    over all 4*len(v_u32) bytes (callers discount their host padding).
    """
    if not 1 <= K <= 31:
        raise ValueError("fused u32 canonical windows support 1 <= K <= 31")
    n4 = v_u32.shape[0]
    if n4 % V != 0:
        raise ValueError(f"u32 view length {n4} must be a multiple of V={V}")
    grid = n4 // V
    last = grid - 1
    kern = partial(
        _kernel_u32, K=K, V=V, interpret=interpret, emit_hash=emit_hash
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
        ],
        out_specs=[
            pl.BlockSpec((1, 4 * V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * V), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 4 * n4), _U32),
            jax.ShapeDtypeStruct((1, 4 * n4), _U32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(v_u32.reshape(1, -1), v_u32.reshape(1, -1))
    return hi.reshape(-1), lo.reshape(-1), cnt[0, 0], cnt[0, 1]


def _launch_bytes(bytes_u8, K, W, interpret, emit_hash):
    from jax import lax

    L = bytes_u8.shape[0]
    Qreal = max(-(-L // 16), 1)
    grid = max(-(-Qreal // W), 1)
    # pad with 'N' (flag class) through one extra carry tile, so tail
    # windows and the last tile's carry reads are all pre-sentineled
    total = 16 * (grid + 1) * W
    padded = jnp.full(total, ord("N"), jnp.uint8).at[:L].set(bytes_u8)
    u32v = lax.bitcast_convert_type(padded.reshape(-1, 4), _U32)
    cols = u32v.reshape(-1, 4).T  # (4, (grid+1) * W), lane q = word q
    kern = partial(
        _kernel_bytes, K=K, W=W, interpret=interpret, emit_hash=emit_hash
    )
    hi, lo = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((4, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, W), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, grid * W), _U32),
            jax.ShapeDtypeStruct((16, grid * W), _U32),
        ],
        interpret=interpret,
    )(cols, cols)
    return hi, lo


@partial(jax.jit, static_argnames=("K", "W", "interpret"))
def canonical_windows_bytes_pallas(
    bytes_u8, K: int, W: int = 4096, interpret: bool = False
):
    """Canonical windows straight from ASCII bytes, offset-major.

    Fuses the whole front-end (classify + pack + flag-stream construction
    of :func:`canonical_windows_masked_pallas`'s launcher) into the
    kernel: one HBM read of the byte stream, no materialized code/flag
    arrays.  Windows containing any non-ACGTU byte — or extending past
    the sequence end — come back as the count sentinel.
    """
    if not 1 <= K <= 31:
        raise ValueError("fused byte canonical windows support 1 <= K <= 31")
    return _launch_bytes(bytes_u8, K, W, interpret, emit_hash=False)


@partial(jax.jit, static_argnames=("K", "W", "interpret"))
def canonical_hash_bytes_pallas(
    bytes_u8, K: int, W: int = 4096, interpret: bool = False
):
    """FxHashes of canonical windows straight from ASCII bytes (the fused
    minhash/minimizer front-end of :func:`canonical_hash_masked_pallas`
    with in-kernel classify+pack).  Invalid windows hash to all-ones."""
    if not 1 <= K <= 31:
        raise ValueError("fused byte canonical hashes support 1 <= K <= 31")
    return _launch_bytes(bytes_u8, K, W, interpret, emit_hash=True)


@partial(jax.jit, static_argnames=("K", "W", "interpret"))
def canonical_windows_pallas(words, K: int, W: int = 4096, interpret: bool = False):
    """Canonical K-mer registers of a packed word stream, offset-major.

    ``words``: uint32 packed stream (from ``pack_words``; pad words are
    ignored).  Returns ``(hi, lo)`` of shape (16, Qpad) where entry
    [r, q] is the canonical kmer at position 16*q + r.  Callers mask or
    slice positions >= L - K + 1.
    """
    if not 1 <= K <= 32:
        raise ValueError("pallas canonical windows support 1 <= K <= 32")
    Q = words.shape[0]
    grid = max(-(-Q // W), 1)
    padded = jnp.zeros(grid * W + 2, _U32).at[:Q].set(words)
    # rows padded to one extra tile so block i+1 always exists — the
    # kernel reads the next tile's first two words as its cross-tile carry
    rows = (
        jnp.zeros((grid + 1) * W, _U32).at[: grid * W + 2].set(padded).reshape(1, -1)
    )
    kern = partial(_kernel, K=K, W=W, interpret=interpret)
    hi, lo = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, grid * W), _U32),
            jax.ShapeDtypeStruct((16, grid * W), _U32),
        ],
        interpret=interpret,
    )(rows, rows)
    return hi[:, :Q], lo[:, :Q]


@partial(jax.jit, static_argnames=("K", "W", "interpret"))
def canonical_windows_masked_pallas(
    codes, certain, K: int, W: int = 4096, interpret: bool = False
):
    """Canonical windows with fused validity masking, offset-major.

    ``certain`` flags unambiguous bases; a window containing any uncertain
    base — or extending past the sequence end — comes back as the count
    sentinel (all-ones limbs), ready for
    :func:`kmers_tpu.ops.count.sort_count` with ``valid=None``.  The mask
    is carried as a second packed stream with identical geometry (0b11 at
    bad bases), windowed by the same shift network — avoiding any
    strided/transposed mask materialization, which costs more than the
    whole kernel on TPU.
    """
    if not 1 <= K <= 31:
        raise ValueError("masked canonical windows support 1 <= K <= 31")
    return _launch_masked(_kernel_masked, codes, certain, K, W, interpret)


@partial(jax.jit, static_argnames=("K", "W", "interpret"))
def canonical_hash_masked_pallas(
    codes, certain, K: int, W: int = 4096, interpret: bool = False
):
    """FxHashes of canonical windows with fused masking, offset-major.

    Fuses the whole minhash/minimizer front-end into one kernel:
    windows + in-register RC + canonical select + FxHash multiply.
    Invalid windows hash to all-ones (sorting after every real hash).
    """
    if not 1 <= K <= 31:
        raise ValueError("masked canonical hashes support 1 <= K <= 31")
    return _launch_masked(_kernel_masked_hash, codes, certain, K, W, interpret)


def _launch_masked(kernel_fn, codes, certain, K, W, interpret):
    from ..encode import pack_words

    L = codes.shape[0]
    Qreal = max(-(-L // 16), 1)
    grid = max(-(-Qreal // W), 1)
    words = pack_words(codes, bps=2, pad_words=0)
    rows = jnp.zeros((grid + 1) * W, _U32).at[:Qreal].set(words).reshape(1, -1)
    F = grid * W + (-(-K // 16)) + 1
    flag_codes = (
        jnp.full(16 * F, 3, _U32)
        .at[:L]
        .set(jnp.where(certain, 0, 3).astype(_U32))
    )
    fwords = pack_words(flag_codes, bps=2, pad_words=0)
    rows_f = jnp.zeros((grid + 1) * W, _U32).at[:F].set(fwords).reshape(1, -1)
    kern = partial(kernel_fn, K=K, W=W, interpret=interpret)
    hi, lo = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, grid * W), _U32),
            jax.ShapeDtypeStruct((16, grid * W), _U32),
        ],
        interpret=interpret,
    )(rows, rows, rows_f, rows_f)
    return hi, lo


def linearize_offset_major(arr_om, n: int):
    """(16, Q) offset-major -> (n,) position-major (window i at index i)."""
    return arr_om.T.reshape(-1)[:n]

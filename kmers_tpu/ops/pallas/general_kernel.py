"""Generalized windowed-extraction Mosaic kernel: bps in {2, 4, 8}.

Extends the 2-bit canonical kernel (window_kernel.py) across the
framework's register widths:

- bps=2: forward or canonical (complement XOR + bitrev + adjacent swap);
- bps=4: forward or canonical — the 4-bit reverse complement is a *pure
  64-bit bit reversal* of the coding bits (reversing nibble order and
  intra-nibble bits simultaneously complements each base, since the
  4-bit complement is the nibble bit-reversal);
- bps=8 (amino acids): forward only.

Optionally fused validity masking via a second packed flag stream (bad
symbol -> all-ones code), emitting the count sentinel for any window
touching a bad symbol or the padded tail — identical mechanism to
``canonical_windows_masked_pallas``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .window_kernel import (
    HAVE_PALLAS,
    _SENT,
    _adjacent,
    _bitrev32,
    _canonical,
    _shr64,
    _window_value,
)

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["windows_pallas_general"]

_U32 = jnp.uint32


def _rc4(fh, fl, s_out: int):
    """4-bit reverse complement: bit-reverse the coding bits, realign."""
    zh = _bitrev32(fl)
    zl = _bitrev32(fh)
    return _shr64(zh, zl, s_out)


def _kernel_general(
    words_ref, next_ref, flags_ref, fnext_ref, hi_ref, lo_ref,
    *, K: int, bps: int, canonical: bool, W: int, interpret: bool,
):
    P = 32 // bps
    wa, w1, w2 = _adjacent(words_ref, next_ref, W, interpret)
    fa, f1, f2 = _adjacent(flags_ref, fnext_ref, W, interpret)
    s_out = 64 - bps * K
    sent = jnp.asarray(_SENT, _U32)
    for r in range(P):
        o = bps * r
        fh, fl = _window_value(wa, w1, w2, o, s_out)
        if canonical and bps == 2:
            ch, cl = _canonical(fh, fl, K, s_out)
        elif canonical and bps == 4:
            rh, rl = _rc4(fh, fl, s_out)
            le = (fh < rh) | ((fh == rh) & (fl <= rl))
            ch = jnp.where(le, fh, rh)
            cl = jnp.where(le, fl, rl)
        else:
            ch, cl = fh, fl
        gh, gl = _window_value(fa, f1, f2, o, s_out)
        bad = (gh | gl) != 0
        hi_ref[r : r + 1, :] = jnp.where(bad, sent, ch)
        lo_ref[r : r + 1, :] = jnp.where(bad, sent, cl)


@partial(jax.jit, static_argnames=("K", "bps", "canonical", "W", "interpret"))
def windows_pallas_general(
    codes,
    good,
    K: int,
    bps: int = 2,
    canonical: bool = False,
    W: int = 4096,
    interpret: bool = False,
):
    """All K-windows of a code stream, offset-major (P, Q) with
    P = 32 // bps; invalid windows (any symbol where ``good`` is False,
    or past the stream end) come back as the count sentinel.

    ``canonical`` is supported for bps in {2, 4}.
    """
    if bps not in (2, 4, 8):
        raise ValueError("bps must be 2, 4, or 8")
    if canonical and bps == 8:
        raise ValueError("canonical selection requires a nucleotide width")
    if not 1 <= K * bps <= 62:
        raise ValueError("need 1 <= K*bps <= 62 (sentinel headroom)")
    from ..encode import pack_words

    P = 32 // bps
    L = codes.shape[0]
    if L == 0:
        z = jnp.full((P, 0), _SENT, _U32)
        return z, z
    Qreal = max(-(-L // P), 1)
    grid = max(-(-Qreal // W), 1)
    words = pack_words(codes, bps=bps, pad_words=0)
    rows = jnp.zeros((grid + 1) * W, _U32).at[:Qreal].set(words).reshape(1, -1)
    F = grid * W + (-(-K // P)) + 1
    bad_code = jnp.asarray((1 << bps) - 1, _U32)
    flag_codes = (
        jnp.full(P * F, bad_code, _U32)
        .at[:L]
        .set(jnp.where(good, jnp.zeros_like(bad_code), bad_code))
    )
    fwords = pack_words(flag_codes, bps=bps, pad_words=0)
    rows_f = jnp.zeros((grid + 1) * W, _U32).at[:F].set(fwords).reshape(1, -1)
    kern = partial(
        _kernel_general, K=K, bps=bps, canonical=canonical, W=W,
        interpret=interpret,
    )
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
            pl.BlockSpec((P, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, grid * W), _U32),
            jax.ShapeDtypeStruct((P, grid * W), _U32),
        ],
        interpret=interpret,
    )(rows, rows, rows_f, rows_f)
    return hi, lo

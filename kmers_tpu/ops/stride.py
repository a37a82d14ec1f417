"""Gather-free strided selection (``x[offset::s]``) for the TPU.

Strided slices of large 1-D arrays are element-serialized on TPU —
``x[::7]`` over 2^26 uint32 measured 245 ms on v5e, and every reshape
detour through an (m, small) intermediate inflates the tiled layout 8-18x
(reshape-column 50 ms, reshape-transpose 40 ms, 1-wide reduce_window
45 ms).  The TPU-shaped answer is to turn the data movement into MXU
work: reshape to (m, s*128) — a layout-friendly minor dimension — and
multiply by a constant 0/1 selection matrix S of shape (s*128, 128) with
S[offset + s*c, c] = 1, so

    out[q*128 + c] = x[q*s*128 + offset + s*c]  ==  x[offset::s]

Exactness: uint32 values ride as two uint16 halves in float32 (both
exactly representable); each output sums s*128 products of which exactly
one is nonzero, so the f32 accumulation is exact.  Measured ~3 ms per
2^26 input on v5e — ~15x the best slice variant, ~80x the naive slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stride_select"]

_U32 = jnp.uint32
_LANES = 128


@partial(jax.jit, static_argnames=("s", "offset", "n_out"))
def stride_select(x, s: int, offset: int = 0, n_out: int | None = None):
    """``x[offset::s]`` (first ``n_out`` elements) without a strided slice.

    ``x``: 1-D unsigned integer array (values must fit uint32).  Returns
    uint32.  For tiny inputs (under one lane group) this falls back to
    the plain slice, which is cheap at that size.
    """
    if s < 1:
        raise ValueError("s must be >= 1")
    n = x.shape[0]
    total = max(n - offset + s - 1, 0) // s if n > offset else 0
    if n_out is None:
        n_out = total
    if s == 1:
        return jax.lax.dynamic_slice_in_dim(
            x.astype(_U32), offset, n_out
        ) if n_out else jnp.zeros(0, _U32)
    group = s * _LANES
    m = -(-max(n_out, 1) * s // group)
    if n < 4 * group:  # tiny: slice cost is irrelevant
        return x[offset::s].astype(_U32)[:n_out]
    need = m * group + offset
    xp = x.astype(_U32)
    if need > n:
        xp = jnp.concatenate([xp, jnp.zeros(need - n, _U32)])
    x2 = jax.lax.dynamic_slice_in_dim(xp, offset, m * group).reshape(m, group)
    sel = np.zeros((group, _LANES), np.float32)
    sel[np.arange(_LANES) * s, np.arange(_LANES)] = 1.0
    selj = jnp.asarray(sel)
    # byte limbs: TPU lowers DEFAULT-precision f32 dots through bf16
    # passes, which round 16-bit limbs (verified wrong on v5e); 8-bit
    # limb values (<= 255) are bf16-exact, and each output sums exactly
    # one nonzero product, so four DEFAULT dots are bit-exact and
    # cheaper than HIGHEST-precision (6-pass) 16-bit dots.
    out = None
    for b in range(4):
        limb = ((x2 >> (8 * b)) & 0xFF).astype(jnp.float32)
        d = jnp.dot(limb, selj, preferred_element_type=jnp.float32)
        part = d.astype(_U32) << (8 * b)
        out = part if out is None else out | part
    return out.reshape(m * _LANES)[:n_out]

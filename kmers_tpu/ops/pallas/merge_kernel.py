"""Fused bitonic compare-exchange tail for table merges.

``kmers_tpu.ops.count.merge_compact_tables`` runs a bitonic merge as
log2(N) jnp compare-exchange passes over three operands — every pass is
a full HBM read + write of (hi, lo, cnt).  All passes whose stride fits
inside one (8, W) tile (d <= 4W) can instead run in VMEM in a single
pass: this kernel fuses the last ``3 + log2(W)`` steps (15 of them at
W=4096) into one HBM round trip, leaving only the few cross-tile
strides (d >= 8W) as jnp passes.  On a 2^26-row merge that replaces 15
of 27 full-array passes — the streaming accumulator's dominant cost on
genome-scale streams.

Within a tile the compare-exchange partner of position ``p`` at stride
``d`` is ``p ^ d``; with the (8, W) row-major layout that is a lane roll
(d < W) or a sublane roll (d in {W, 2W, 4W}), the exact primitives the
RLE kernel already uses — no gathers, no relayouts.  Ascending merge
direction everywhere (the caller reverses table B before the network,
as in merge_compact_tables).
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

__all__ = ["bitonic_merge_tail_pallas", "TAIL_STEPS"]

_U32 = jnp.uint32
_I32 = jnp.int32


def TAIL_STEPS(W: int) -> int:
    """Number of compare-exchange steps the kernel fuses: strides
    4W, 2W, W, W/2, ..., 1."""
    return 3 + W.bit_length() - 1


def _roll(x, k: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(x, k, axis=axis)
    return pltpu.roll(x, np.int32(k), axis=axis)


def _kernel(
    hi_ref, lo_ref, cnt_ref, oh_ref, ol_ref, oc_ref,
    *, W: int, interpret: bool,
):
    h, l, c = hi_ref[:], lo_ref[:], cnt_ref[:]
    lane = jax.lax.broadcasted_iota(_I32, (8, W), 1)
    row = jax.lax.broadcasted_iota(_I32, (8, W), 0)

    def step(h, l, c, d: int):
        if d >= W:
            j = d // W  # row-stride: partner row = row ^ j
            bit = (row & j) == 0

            def partner(x):
                down = _roll(x, j, 0, interpret)      # x[r - j]
                up = _roll(x, 8 - j, 0, interpret)    # x[r + j]
                return jnp.where(bit, up, down)
        else:
            bit = (lane & d) == 0

            def partner(x):
                right = _roll(x, d, 1, interpret)     # x[l - d]
                left = _roll(x, W - d, 1, interpret)  # x[l + d]
                return jnp.where(bit, left, right)

        ph, pl_, pc = partner(h), partner(l), partner(c)
        le = (h < ph) | ((h == ph) & (l <= pl_))
        keep = bit == le  # low element keeps min, high keeps max
        return (
            jnp.where(keep, h, ph),
            jnp.where(keep, l, pl_),
            jnp.where(keep, c, pc),
        )

    d = 4 * W
    while d >= 1:
        h, l, c = step(h, l, c, d)
        d //= 2
    oh_ref[:] = h
    ol_ref[:] = l
    oc_ref[:] = c


@partial(jax.jit, static_argnames=("W", "interpret"))
def bitonic_merge_tail_pallas(xh, xl, xc, W: int = 4096, interpret: bool = False):
    """Run the in-tile bitonic merge steps (strides 4W down to 1) over a
    (hi, lo, cnt) triple whose length is a multiple of 8*W.  The caller
    must already have applied every stride >= 8W."""
    n = xh.shape[0]
    tile = 8 * W
    if n % tile != 0:
        raise ValueError(f"length {n} must be a multiple of {tile}")
    grid = n // tile
    kern = partial(_kernel, W=W, interpret=interpret)
    spec = pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oh, ol, oc = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _I32),
        ],
        interpret=interpret,
    )(
        xh.reshape(-1, W),
        xl.reshape(-1, W),
        xc.astype(_I32).reshape(-1, W),
    )
    return oh.reshape(-1), ol.reshape(-1), oc.reshape(-1)

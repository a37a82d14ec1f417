"""Hand-written bitonic sort of (hi, lo) u32 pairs — the sort-wall probe.

The XLA comparator sort is 89% of the flagship's device time; round-3
closed every gather/scatter/radix door on this toolchain, leaving one
question (VERDICT round 2 #1c): can a hand-scheduled Mosaic bitonic
network beat XLA's sort, whose measured rate is ~6 VPU ops per
element-stage (i.e. already near comparator-bound)?

Structure (textbook bitonic network, direction rule ``(pos >> k) & 1``):

- **Local pass** (one HBM round trip): every (8, W) tile runs stages
  k = 1..log2(8W) fully in VMEM — 120 compare-exchange steps at W=4096.
  Partners are lane rolls (d < W) / sublane rolls (d = W, 2W, 4W), the
  primitives of the RLE and merge-tail kernels; no gathers.
- **Cross-tile stages** k > log2(8W): the steps with stride >= 8W are
  plain jnp compare-exchange passes (traffic-bound); the in-tile tail
  (15 steps) of each stage fuses into one Mosaic pass via the same
  kernel parameterized by the stage's direction bit.

Total Mosaic stages for n = 2^24: 120 + 9x15 = 255 fused into 10 HBM
round trips, plus 45 jnp cross-tile passes.  Whether this beats
``lax.sort`` is an empirical question answered by
tools/tpu_round4b.py; the kernels are exact (validated against
``lax.sort`` in interpreter mode) either way.
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

__all__ = ["bitonic_sort_pallas", "bitonic_local_sort_pallas"]

_U32 = jnp.uint32
_I32 = jnp.int32


def _roll(x, k: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(x, k, axis=axis)
    return pltpu.roll(x, np.int32(k), axis=axis)


def _ce_step(h, l, d: int, dir_desc, lane, row, W: int, interpret: bool):
    """One compare-exchange at stride d (in-tile: d <= 4W) with
    per-element descending mask ``dir_desc``."""
    if d >= W:
        j = d // W
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

    ph, pl_ = partner(h), partner(l)
    le = (h < ph) | ((h == ph) & (l <= pl_))
    keep = (bit == le) ^ dir_desc
    return jnp.where(keep, h, ph), jnp.where(keep, l, pl_)


def _kernel_local(hi_ref, lo_ref, oh_ref, ol_ref, *, W: int, interpret: bool):
    """Full bitonic sort of each 8W tile (stages 1..log2(8W)); direction
    follows the global position, so tiles come out alternately
    ascending/descending — the bitonic precondition for the cross-tile
    stages."""
    h, l = hi_ref[:], lo_ref[:]
    lane = jax.lax.broadcasted_iota(_I32, (8, W), 1)
    row = jax.lax.broadcasted_iota(_I32, (8, W), 0)
    pid = pl.program_id(0)
    pos = (pid * 8 + row) * W + lane
    m = (8 * W).bit_length() - 1  # log2(tile)
    for k in range(1, m + 1):
        dir_desc = ((pos >> k) & 1) == 1
        for j in range(k - 1, -1, -1):
            h, l = _ce_step(h, l, 1 << j, dir_desc, lane, row, W, interpret)
    oh_ref[:] = h
    ol_ref[:] = l


def _kernel_tail(
    hi_ref, lo_ref, oh_ref, ol_ref, *, k_bit: int, W: int, interpret: bool
):
    """The in-tile tail (strides 4W..1) of cross-tile stage ``k_bit``."""
    h, l = hi_ref[:], lo_ref[:]
    lane = jax.lax.broadcasted_iota(_I32, (8, W), 1)
    row = jax.lax.broadcasted_iota(_I32, (8, W), 0)
    pid = pl.program_id(0)
    pos = (pid * 8 + row) * W + lane
    dir_desc = ((pos >> k_bit) & 1) == 1
    d = 4 * W
    while d >= 1:
        h, l = _ce_step(h, l, d, dir_desc, lane, row, W, interpret)
        d //= 2
    oh_ref[:] = h
    ol_ref[:] = l


def _launch(kern, xh, xl, W: int, interpret: bool):
    n = xh.shape[0]
    grid = n // (8 * W)
    spec = pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
        ],
        interpret=interpret,
    )(xh.reshape(-1, W), xl.reshape(-1, W))
    return oh.reshape(-1), ol.reshape(-1)


@partial(jax.jit, static_argnames=("W", "interpret"))
def bitonic_local_sort_pallas(xh, xl, W: int = 4096, interpret: bool = False):
    """Sort each 8W tile of (hi, lo) in one HBM pass (alternating
    direction by tile parity — see module docstring)."""
    n = xh.shape[0]
    if n % (8 * W) != 0:
        raise ValueError(f"length {n} must be a multiple of {8 * W}")
    kern = partial(_kernel_local, W=W, interpret=interpret)
    return _launch(kern, xh, xl, W, interpret)


@partial(jax.jit, static_argnames=("W", "interpret"))
def bitonic_sort_pallas(xh, xl, W: int = 4096, interpret: bool = False):
    """Full ascending sort of (hi, lo) u32 pairs; n must be a power of
    two and a multiple of 8W.  Drop-in for
    ``lax.sort((hi, lo), num_keys=2)`` on sentinel-padded streams."""
    n = xh.shape[0]
    tile = 8 * W
    if n % tile != 0 or (n & (n - 1)) != 0:
        raise ValueError(
            f"length {n} must be a power of two and a multiple of {tile}"
        )
    xh, xl = bitonic_local_sort_pallas(xh, xl, W=W, interpret=interpret)
    m_tile = tile.bit_length() - 1
    m = n.bit_length() - 1
    for k in range(m_tile + 1, m + 1):
        # cross-tile strides: plain jnp compare-exchange passes
        for j in range(k - 1, m_tile - 1, -1):
            d = 1 << j
            h2 = xh.reshape(-1, 2, d)
            l2 = xl.reshape(-1, 2, d)
            th, bh = h2[:, 0], h2[:, 1]
            tl, bl = l2[:, 0], l2[:, 1]
            # direction of the pair block starting at 2*d*rowidx
            rows = n // (2 * d)
            start = jnp.arange(rows, dtype=_I32) * (2 * d)
            desc = (((start >> k) & 1) == 1)[:, None]
            le = (th < bh) | ((th == bh) & (tl <= bl))
            keep = le ^ desc
            xh = jnp.stack(
                [jnp.where(keep, th, bh), jnp.where(keep, bh, th)], 1
            ).reshape(-1)
            xl = jnp.stack(
                [jnp.where(keep, tl, bl), jnp.where(keep, bl, tl)], 1
            ).reshape(-1)
        kern = partial(_kernel_tail, k_bit=k, W=W, interpret=interpret)
        xh, xl = _launch(kern, xh, xl, W, interpret)
    return xh, xl

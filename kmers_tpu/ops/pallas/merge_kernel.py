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


# ---------------------------------------------------------------------------
# Fused compaction tail: the in-tile passes of compact_counts' log-shift
# network.  Pass k moves a row left by 2^k iff bit k of its hole count d
# is set; all passes with 2^k < 8W touch only rows within [p, p + 8W)
# for an element at p, so loading tile i plus tile i+1 lets one Mosaic
# pass apply passes k = 0..log2(8W)-1 and emit the updated (rows, d, v)
# for the remaining cross-tile jnp passes.

__all__.append("compact_tail_pallas")


def _shift_left(x, s: int, lane, interpret: bool, W: int):
    """new[p] = x[p + s] over a (16, W) row-major buffer (zeros shifted
    in at the end)."""
    if s >= W:
        j = s // W
        out = _roll(x, 16 - j, 0, interpret)  # row r <- row r + j
        row16 = jax.lax.broadcasted_iota(_I32, (16, W), 0)
        return jnp.where(row16 >= 16 - j, jnp.zeros_like(x), out)
    r_lane = _roll(x, W - s, 1, interpret)     # lane l <- lane l + s (mod W)
    r_next = _roll(r_lane, 15, 0, interpret)   # row r <- row r + 1 of r_lane
    out = jnp.where(lane < W - s, r_lane, r_next)
    row16 = jax.lax.broadcasted_iota(_I32, (16, W), 0)
    tail = (row16 == 15) & (lane >= W - s)
    return jnp.where(tail, jnp.zeros_like(x), out)


def _kernel_compact(
    h_ref, l_ref, c_ref, d_ref, v_ref,
    nh_ref, nl_ref, nc_ref, nd_ref, nv_ref,
    oh_ref, ol_ref, oc_ref, od_ref, ov_ref,
    *, W: int, interpret: bool,
):
    pid = pl.program_id(0)
    last = pid == pl.num_programs(0) - 1
    row16 = jax.lax.broadcasted_iota(_I32, (16, W), 0)
    lane = jax.lax.broadcasted_iota(_I32, (16, W), 1)
    z32 = jnp.zeros((16, W), _I32)

    def cat(a_ref, b_ref, invalid):
        both = jnp.concatenate([a_ref[:], b_ref[:]], axis=0)
        if invalid is not None:
            # the clamped next tile of the last grid step is not real
            # data: treat its rows as empty (v=0, values 0)
            both = jnp.where(last & (row16 >= 8), invalid, both)
        return both

    h = cat(h_ref, nh_ref, None)
    l = cat(l_ref, nl_ref, None)
    c = cat(c_ref, nc_ref, z32)
    d = cat(d_ref, nd_ref, z32)
    v = cat(v_ref, nv_ref, z32)

    n_steps = (8 * W).bit_length() - 1  # k = 0 .. log2(8W)-1
    for k in range(n_steps):
        s = 1 << k
        d_in = _shift_left(d, s, lane, interpret, W)
        v_in = _shift_left(v, s, lane, interpret, W)
        take = (v_in != 0) & (((d_in >> k) & 1) == 1)
        stay = (v != 0) & (((d >> k) & 1) == 0)
        h = jnp.where(take, _shift_left(h.astype(_I32), s, lane, interpret, W).astype(h.dtype),
                      jnp.where(stay, h, jnp.zeros_like(h)))
        l = jnp.where(take, _shift_left(l.astype(_I32), s, lane, interpret, W).astype(l.dtype),
                      jnp.where(stay, l, jnp.zeros_like(l)))
        c = jnp.where(take, _shift_left(c, s, lane, interpret, W),
                      jnp.where(stay, c, jnp.zeros_like(c)))
        d = jnp.where(take, d_in, d)
        v = jnp.where(take, jnp.ones((16, W), _I32), jnp.where(stay, v, z32))

    oh_ref[:] = h[:8]
    ol_ref[:] = l[:8]
    oc_ref[:] = c[:8]
    od_ref[:] = d[:8]
    ov_ref[:] = v[:8]


@partial(jax.jit, static_argnames=("W", "interpret"))
def compact_tail_pallas(uh, ul, cnt, d, v, W: int = 4096, interpret: bool = False):
    """Apply compaction passes k = 0..log2(8W)-1 in one Mosaic pass.

    Inputs/outputs are the log-shift network's state: row values
    (uh, ul, cnt), per-row remaining hole distance ``d`` (int32), and
    validity ``v`` (int32 0/1).  The caller continues with the k >=
    log2(8W) jnp passes on the returned state.
    """
    n = uh.shape[0]
    tile = 8 * W
    if n % tile != 0:
        raise ValueError(f"length {n} must be a multiple of {tile}")
    grid = n // tile
    kern = partial(_kernel_compact, W=W, interpret=interpret)
    cur = pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec(
        (8, W),
        lambda i: (jnp.minimum(i + 1, grid - 1), 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[cur, cur, cur, cur, cur, nxt, nxt, nxt, nxt, nxt],
        out_specs=[cur, cur, cur, cur, cur],
        out_shape=[
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _I32),
            jax.ShapeDtypeStruct((grid * 8, W), _I32),
            jax.ShapeDtypeStruct((grid * 8, W), _I32),
        ],
        interpret=interpret,
    )(
        uh.reshape(-1, W), ul.reshape(-1, W), cnt.astype(_I32).reshape(-1, W),
        d.astype(_I32).reshape(-1, W), v.astype(_I32).reshape(-1, W),
        uh.reshape(-1, W), ul.reshape(-1, W), cnt.astype(_I32).reshape(-1, W),
        d.astype(_I32).reshape(-1, W), v.astype(_I32).reshape(-1, W),
    )
    oh, ol, oc, od, ov = outs
    return (
        oh.reshape(-1), ol.reshape(-1), oc.reshape(-1),
        od.reshape(-1), ov.reshape(-1),
    )

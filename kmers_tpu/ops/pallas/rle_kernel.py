"""Single-pass run-length-encode Pallas kernel for sorted kmer streams.

Replaces the XLA formulation in :func:`kmers_tpu.ops.count._run_length_encode`
(neighbor compares + ``lax.cummax`` + wheres — several HBM passes and two
scan HLOs) with one fused pass: the grid walks the stream sequentially in
(8, W) tiles laid out row-major (position = 8W*tile + W*r + l — the
natural memory order, so tile-aligned inputs are zero-copy), computes run
boundaries from rolled lane/sublane vectors, run-start positions from a
per-row log-step max-scan plus an 8-row prefix, and carries
(last key, last run-start, n_unique) across tiles in SMEM scratch — the
shard-level analogue of the reference's cross-word carry propagation
(/root/reference/src/tuple_bitflipping.jl:24-46).

The (8, W) layout matters: a (1, W) vector occupies 1/8 of each VREG's
sublanes, so the old single-row kernel ran the scan at 1/8 VPU
utilization (measured 23 ms at 2^26 on v5e); the 8-row tile does the
same per-element work at full utilization.

Semantics are identical to the unit-weight ``_run_length_encode``: the
table is sentinel-interspersed — each run's last element keeps the kmer
and its total; everything else is sentinel/zero padding.
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

__all__ = ["rle_unit_pallas"]

_U32 = jnp.uint32
_I32 = jnp.int32
_SENT = 0xFFFFFFFF


def _roll_lanes(x, k: int, interpret: bool):
    """Lane l receives the value of lane l-k (circularly)."""
    if interpret:
        return jnp.roll(x, k, axis=1)
    # np.int32 shift: a Python-int literal becomes i64 under x64 mode,
    # which Mosaic cannot lower
    return pltpu.roll(x, np.int32(k), axis=1)


def _roll_rows(x, k: int, interpret: bool):
    """Row r receives the value of row r-k (circularly)."""
    if interpret:
        return jnp.roll(x, k, axis=0)
    return pltpu.roll(x, np.int32(k), axis=0)  # i32: x64-safe


def _kernel(
    hi_ref, lo_ref, nhi_ref, nlo_ref, uh_ref, ul_ref, cnt_ref, nu_ref,
    keys_scr, s_scr, nu_scr, *, W: int, interpret: bool,
):
    pid = pl.program_id(0)
    last_block = pid == pl.num_programs(0) - 1
    hi = hi_ref[:]  # (8, W), row-major linear order
    lo = lo_ref[:]
    lane = jax.lax.broadcasted_iota(_I32, (8, W), 1)
    row = jax.lax.broadcasted_iota(_I32, (8, W), 0)
    pos = (pid * 8 + row) * W + lane  # global linear position (n < 2^31)
    sent = jnp.asarray(_SENT, _U32)

    def prev_of(x, carry):
        # lane l-1 within the row; row boundaries take the previous
        # row's last lane via a second (row) roll of the lane-rolled
        # tile — full-tile ops only, no sub-tile slices
        p0 = _roll_lanes(x, 1, interpret)
        pr = _roll_rows(p0, 1, interpret)  # at (r, 0): x[r-1, W-1]
        p = jnp.where(lane == 0, pr, p0)
        return jnp.where((lane == 0) & (row == 0), carry, p)

    ph = prev_of(hi, keys_scr[0])
    plo = prev_of(lo, keys_scr[1])
    first = (hi != ph) | (lo != plo) | (pos == 0)

    def next_of(x, nxt00):
        n0 = _roll_lanes(x, W - 1, interpret)
        nr = _roll_rows(n0, 7, interpret)  # at (r, W-1): x[r+1, 0]
        n = jnp.where(lane == W - 1, nr, n0)
        return jnp.where((lane == W - 1) & (row == 7), nxt00, n)

    nh = next_of(hi, nhi_ref[0, 0])
    nl = next_of(lo, nlo_ref[0, 0])
    is_last = (hi != nh) | (lo != nl)
    is_last = is_last | (last_block & (lane == W - 1) & (row == 7))

    # run-start position: per-row log-step max-scan of (first ? pos : -1),
    # then an 8-row exclusive prefix, then the cross-tile carry
    neg1 = np.int32(-1)  # pinned literals: x64-safe
    x = jnp.where(first, pos, neg1)
    k = 1
    while k < W:
        sh = _roll_lanes(x, k, interpret)
        x = jnp.maximum(x, jnp.where(lane < k, neg1, sh))
        k *= 2
    # x is a running row max, so the row total is the cross-lane max
    incl = jnp.max(x, axis=1, keepdims=True)  # (8, 1) inclusive per row
    k = 1
    while k < 8:
        sh = _roll_rows(incl, k, interpret)
        incl = jnp.maximum(incl, jnp.where(row[:, :1] < k, neg1, sh))
        k *= 2
    excl = _roll_rows(incl, 1, interpret)
    excl = jnp.where(row[:, :1] == 0, neg1, excl)
    carry_s = jnp.where(pid == 0, np.int32(0), s_scr[0])
    start = jnp.maximum(jnp.maximum(x, excl), carry_s)

    is_sent = (hi == sent) & (lo == sent)
    emit = is_last & (~is_sent)
    uh_ref[:] = jnp.where(emit, hi, sent)
    ul_ref[:] = jnp.where(emit, lo, sent)
    cnt_ref[:] = jnp.where(emit, pos - start + 1, np.int32(0))

    # dtype pinned: under jax_enable_x64 an unpinned sum accumulates in
    # int64, which Mosaic cannot lower
    block_nu = jnp.sum(emit, dtype=_I32)

    @pl.when(pid == 0)
    def _():
        nu_scr[0] = block_nu

    @pl.when(pid != 0)
    def _():
        nu_scr[0] = nu_scr[0] + block_nu

    @pl.when(last_block)
    def _():
        nu_ref[0, 0] = nu_scr[0]

    # carries for the next block (grid steps execute in order on TPU)
    keys_scr[0] = hi[7, W - 1]
    keys_scr[1] = lo[7, W - 1]
    s_scr[0] = start[7, W - 1]


@partial(jax.jit, static_argnames=("W", "interpret"))
def rle_unit_pallas(shi, slo, W: int = 4096, interpret: bool = False):
    """Unit-weight RLE of a pre-sorted (hi, lo) stream.

    Returns ``(uniq_hi, uniq_lo, counts, n_unique)`` with the same
    sentinel-interspersed contract as
    :func:`kmers_tpu.ops.count._run_length_encode`.
    """
    n = shi.shape[0]
    if n == 0:
        return (
            jnp.zeros(0, _U32),
            jnp.zeros(0, _U32),
            jnp.zeros(0, _I32),
            jnp.zeros((), _I32),
        )
    tile = 8 * W
    grid = max(-(-n // tile), 1)
    sent = jnp.asarray(_SENT, _U32)
    if n == grid * tile:
        # tile-aligned hot path (the sort output): zero-copy reshape
        hi_p = shi.reshape(grid * 8, W)
        lo_p = slo.reshape(grid * 8, W)
    else:
        padded = grid * tile
        hi_p = jnp.full(padded, sent, _U32).at[:n].set(shi).reshape(-1, W)
        lo_p = jnp.full(padded, sent, _U32).at[:n].set(slo).reshape(-1, W)
    kern = partial(_kernel, W=W, interpret=interpret)
    n_blocks = grid  # (8, 128)-block row units == (8, W)-tile row units
    uh, ul, cnt, nu = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # the next tile's first (8, 128) sub-block — only its [0, 0]
            # element is read (the final is_last decision); Mosaic block
            # shapes must be (8k, 128m)-divisible, so this is the
            # smallest legal read.  Clamped on the last tile (forced).
            pl.BlockSpec(
                (8, 128),
                lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 128),
                lambda i: (jnp.minimum(i + 1, n_blocks - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _U32),
            jax.ShapeDtypeStruct((grid * 8, W), _I32),
            jax.ShapeDtypeStruct((1, 1), _I32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), _U32),
            pltpu.SMEM((1,), _I32),
            pltpu.SMEM((1,), _I32),
        ],
        interpret=interpret,
    )(hi_p, lo_p, hi_p, lo_p)
    uh = uh.reshape(-1)[:n]
    ul = ul.reshape(-1)[:n]
    cnt = cnt.reshape(-1)[:n]
    return uh, ul, cnt, nu[0, 0]

"""Sharded minimizer selection over a device mesh.

Data-parallel version of :func:`kmers_tpu.pipelines.minimizer_select`:
each device computes canonical kmers and sliding-min FxHash selections
for the minimizer windows whose start position it owns.  A minimizer
window j covers kmers [j, j+W) and therefore bases [j, j+W+K-1), so
shards carry a right halo of W+K-2 bases — the halo principle of the
counting pipelines, widened to the minimizer span.

Adjacent windows sharing a minimizer may straddle a shard boundary and
be selected by both owners; the host-side dedup by position (already
required within a device) removes cross-device duplicates identically,
so results are bit-identical to the single-chip pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alphabets import EncodeError, DNAAlphabet2
from ..ops.encode import classify_2bit
from ..ops.minimizer import minimizers as _minimizers
from ..ops.windows import canonical_windows_from_codes
from .mesh import data_mesh
from .pipeline import _fetch_np, _put_sharded

__all__ = ["sharded_minimizer_select"]

_U32 = jnp.uint32
_I32 = jnp.int32


def _device_body(
    shard_bytes,
    K: int,
    W: int,
    shard: int,
    n_global: int,
    axis: str,
    skip_ambiguous: bool = False,
):
    data = shard_bytes[0]  # (shard + W + K - 2,)
    codes, certain, ambig = classify_2bit(data)
    bad = ~certain if not skip_ambiguous else ~(certain | ambig)
    hi, lo = canonical_windows_from_codes(codes, K)
    if skip_ambiguous:
        from ..ops.minimizer import minimizers_masked
        from ..ops.windows import window_valid_mask

        valid = window_valid_mask(certain, K)
        mh, ml, mp = minimizers_masked(hi, lo, valid, W)
    else:
        mh, ml, mp = _minimizers(hi, lo, W)  # local windows: shard of them
    mh, ml, mp = mh[:shard], ml[:shard], mp[:shard]
    d = jax.lax.axis_index(axis)
    base = d * shard
    # all-invalid windows carry mp == -1; keep them -1 in global coords
    gpos = jnp.where(mp < 0, -1, mp.astype(_I32) + base)
    j = jnp.arange(shard, dtype=_I32) + base
    in_range = j < n_global
    sent = jnp.asarray(0xFFFFFFFF, _U32)
    mh = jnp.where(in_range, mh, sent)
    ml = jnp.where(in_range, ml, sent)
    gpos = jnp.where(in_range, gpos, -1)
    # full local buffer (body + halo): halo bases are double-counted but
    # the check is only bad > 0, and this covers the global tail halo
    # that no body spans
    n_bad = jax.lax.psum(jnp.sum(bad.astype(_I32)), axis)
    return mh[None], ml[None], gpos[None], n_bad[None]


import functools


@functools.lru_cache(maxsize=64)
def _minimizer_step(
    mesh: Mesh,
    K: int,
    W: int,
    shard: int,
    n_global: int,
    skip_ambiguous: bool = False,
):
    """Cached jitted SPMD step (rebuilding per call would recompile)."""
    axis = mesh.axis_names[0]
    body = partial(
        _device_body,
        K=K,
        W=W,
        shard=shard,
        n_global=n_global,
        axis=axis,
        skip_ambiguous=skip_ambiguous,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis)),
    )
    return jax.jit(mapped)


def sharded_minimizer_select(
    data,
    K: int = 15,
    W: int = 10,
    mesh: Mesh | None = None,
    skip_ambiguous: bool = False,
):
    """(W, K)-minimizer sampling across all devices of ``mesh``.

    Returns (kmer values uint64, positions int64), deduplicated —
    identical to ``pipelines.minimizer_select`` on one chip.  With
    ``skip_ambiguous=False`` the buffer must be ambiguity-free; with
    ``skip_ambiguous=True`` ambiguous kmers are excluded from candidacy
    (windows with no valid kmer select nothing), matching the
    single-chip ``minimizer_select(skip_ambiguous=True)`` bit-for-bit on
    any device count.
    """
    from ..pipelines.extract import _prep

    arr = _prep(data)  # read-only view; only ever copied into shard buffers
    if mesh is None:
        mesh = data_mesh()
    n_dev = mesh.devices.size
    L = arr.shape[0]
    span = W + K - 1
    n_global = L - span + 1
    if n_global < 1:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)

    shard = -(-n_global // n_dev)
    halo = span - 1
    # pad with 'N' under skipping (never a candidate), 'A' otherwise
    # (the pad can't be selected: tail windows are masked by n_global)
    pad_byte = ord("N") if skip_ambiguous else ord("A")
    padded = np.full(n_dev * shard + halo, pad_byte, dtype=np.uint8)
    padded[:L] = arr
    shards = np.empty((n_dev, shard + halo), dtype=np.uint8)
    for d in range(n_dev):
        shards[d] = padded[d * shard : d * shard + shard + halo]

    axis = mesh.axis_names[0]
    step = _minimizer_step(mesh, K, W, shard, n_global, skip_ambiguous)
    sharding = NamedSharding(mesh, P(axis, None))
    mh, ml, gpos, n_bad = step(_put_sharded(shards, sharding))
    # padding never counts as bad: under skipping, pad 'N' is ambiguous
    # (allowed); otherwise pad 'A' is certain
    if int(_fetch_np(n_bad)[0]) > 0:
        msg = "<invalid base>" if skip_ambiguous else "<ambiguous or invalid base>"
        raise EncodeError(DNAAlphabet2(), msg)
    vals = (
        _fetch_np(mh).reshape(-1).astype(np.uint64) << np.uint64(32)
    ) | _fetch_np(ml).reshape(-1).astype(np.uint64)
    pos = _fetch_np(gpos).reshape(-1).astype(np.int64)
    keep = pos >= 0
    vals, pos = vals[keep], pos[keep]
    # dedup consecutive equal positions (within and across shards)
    pos_u, idx = np.unique(pos, return_index=True)
    return vals[idx], pos_u

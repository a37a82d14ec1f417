"""Sharded canonical k-mer counting over a device mesh.

The multi-device flagship pipeline (SURVEY.md §7 M6, BASELINE.json config 5):

1. **Halo sharding**: the input byte stream is split into ``n_dev`` equal
   shards, each extended by K-1 bases of right-halo so no window is lost
   or duplicated at shard boundaries — the reference's cross-word carry
   (/root/reference/src/tuple_bitflipping.jl:24-46) lifted to the
   device-shard granularity.
2. **Local extraction**: each device classifies, packs, and extracts its
   canonical windows (identical kernels to the single-chip path).
3. **Hash-prefix exchange**: each window is routed to the device owning
   its FxHash prefix via ``all_to_all`` (ICI), so every distinct kmer
   lands on exactly one device.
4. **Local count**: per-device sort-count yields a hash-partitioned,
   globally deduplicated count table.

Deterministic by construction: the exchange is keyed by hash prefix and
the local tables are sorted, so results are bit-identical across runs and
device counts (after host-side concatenation + merge of the partitions).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.count import SENTINEL, sort_count
from ..ops.encode import classify_2bit
from ..ops.hashing import fx_hash_u64
from ..ops.windows import canonical_windows_from_codes, window_valid_mask
from .mesh import data_mesh

__all__ = ["ShardedCountConfig", "sharded_count_step", "sharded_canonical_count"]

_U32 = jnp.uint32
_I32 = jnp.int32


@dataclasses.dataclass(frozen=True)
class ShardedCountConfig:
    K: int = 31
    #: per-destination bucket capacity as a multiple of the uniform share;
    #: FxHash spreads kmers near-uniformly, so a small factor suffices.
    #: Overflow is detected and reported, never silently dropped.
    bucket_factor: float = 2.0
    #: use the fused Mosaic window kernel per device; None = auto (TPU only).
    use_pallas: bool | None = None
    #: run the kernel in interpreter mode (CPU testing of the kernel path).
    pallas_interpret: bool = False

    def __post_init__(self):
        if not 1 <= self.K <= 31:
            raise ValueError("sharded counting supports 1 <= K <= 31")


def _device_body(
    shard_bytes,
    K: int,
    n_dev: int,
    cap: int,
    axis: str,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Per-device SPMD body (runs under shard_map).

    ``shard_bytes``: (1, shard_len + K - 1) uint8 — this device's bases
    plus right halo (zero-padded at the global end; padding bytes are
    invalid so the windows they touch are masked).

    Local-aggregate-then-shuffle (the KMC/Gerbil structure, made SPMD):
    each device first collapses its windows to a local (kmer, count)
    table, then routes table rows by FxHash prefix with ``all_to_all``.
    Deduplicating before the exchange makes bucket load proportional to
    *distinct* kmers — immune to low-complexity skew (poly-A runs,
    repeats) that would overflow any fixed raw-window bucketing — and
    shrinks the wire volume to the distinct set.
    """
    data = shard_bytes[0]
    codes, certain, _ambig = classify_2bit(data)
    # count invalid bytes over the shard body only (halo bytes are the next
    # shard's body, so body instances cover every global byte exactly once)
    body_len = data.shape[0] - (K - 1)
    invalid = (~(certain | _ambig))[:body_len]
    if use_pallas:
        from ..ops.pallas.window_kernel import canonical_windows_bytes_pallas

        # fused classify+pack+windows; invalid windows pre-sentineled
        hi_om, lo_om = canonical_windows_bytes_pallas(
            data, K, interpret=interpret
        )
        hi, lo, valid = hi_om.reshape(-1), lo_om.reshape(-1), None
    else:
        hi, lo = canonical_windows_from_codes(codes, K)
        valid = window_valid_mask(certain, K)

    # local aggregation: sentinel-interspersed (kmer, count) table
    uh, ul, cnt, _ = sort_count(hi, lo, valid, key_bits=2 * K)
    uh, ul, cnt, nu, overflow = exchange_and_merge(uh, ul, cnt, n_dev, cap, axis)
    n_invalid = jax.lax.psum(jnp.sum(invalid), axis)
    total_overflow = jax.lax.psum(overflow, axis)
    return (
        uh[None],
        ul[None],
        cnt[None],
        nu[None],
        n_invalid[None],
        total_overflow[None],
    )


def exchange_and_merge(uh, ul, cnt, n_dev: int, cap: int, axis: str):
    """Route a local (kmer, count) table by FxHash prefix over all_to_all
    and merge the received partitions.  Returns (uh, ul, cnt, n_unique,
    overflow) — overflow counts real rows dropped for exceeding ``cap``
    (callers must psum and fail loudly on > 0).
    """
    sent = jnp.asarray(SENTINEL, _U32)
    is_sent = (uh == sent) & (ul == sent)

    # route rows to the device owning the kmer's hash prefix; sentinel
    # padding rows spread round-robin (they are droppable filler)
    hh, _hl = fx_hash_u64(uh, ul)
    shift = 32 - max(n_dev - 1, 1).bit_length()
    dest = (hh >> shift).astype(_U32) % n_dev
    n_rows = uh.shape[0]
    rr = jnp.arange(n_rows, dtype=_U32) % n_dev
    dest = jnp.where(is_sent, rr, dest)

    # stable sort by (destination, is_sentinel): within each destination
    # segment real rows come first, so a bucket that truncates at `cap`
    # only ever drops sentinel filler — capacity is governed by *distinct*
    # kmers per destination, not by the padded table size
    key = dest * 2 + is_sent.astype(_U32)
    _, suh, sul, scnt = jax.lax.sort(
        (key, uh, ul, cnt), num_keys=1, is_stable=True
    )
    seg_counts = jnp.bincount((dest).astype(_I32), length=n_dev)
    seg_real = jnp.bincount(
        jnp.where(is_sent, n_dev, dest.astype(_I32)), length=n_dev + 1
    )[:n_dev]
    seg_starts = jnp.concatenate(
        [jnp.zeros(1, seg_counts.dtype), jnp.cumsum(seg_counts)[:-1]]
    )
    overflow = jnp.sum(jnp.maximum(seg_real - cap, 0))

    # fixed-capacity buckets: (n_dev, cap), real rows first per segment
    idx = seg_starts[:, None] + jnp.arange(cap, dtype=_I32)[None, :]
    in_seg = jnp.arange(cap, dtype=_I32)[None, :] < seg_counts[:, None]
    idx = jnp.clip(idx, 0, n_rows - 1).astype(_I32)
    bh = jnp.where(in_seg, jnp.take(suh, idx), sent)
    bl = jnp.where(in_seg, jnp.take(sul, idx), sent)
    bc = jnp.where(in_seg, jnp.take(scnt, idx), 0)

    # exchange: row d of the result comes from device d's bucket for us
    a2a = partial(
        jax.lax.all_to_all, axis_name=axis, split_axis=0, concat_axis=0, tiled=True
    )
    bh, bl, bc = a2a(bh), a2a(bl), a2a(bc)

    # merge the n_dev received tables (weighted run-length encode)
    # unstable is safe: the RLE sums counts over each equal-(hi,lo) run
    shi, slo, scnt2 = jax.lax.sort(
        (bh.reshape(-1), bl.reshape(-1), bc.reshape(-1)),
        num_keys=2,
        is_stable=False,
    )
    from ..ops.count import _run_length_encode

    uh, ul, cnt, nu = _run_length_encode(shi, slo, scnt2)
    return uh, ul, cnt, nu, overflow


import functools


@functools.lru_cache(maxsize=64)
def sharded_count_step(
    mesh: Mesh,
    K: int,
    shard_len: int,
    cap: int,
    use_pallas: bool = False,
    interpret: bool = False,
):
    """Build the jitted SPMD counting step for a fixed geometry.

    Returns a function of a (n_dev, shard_len + K - 1) uint8 array sharded
    over the mesh's data axis.  Cached per geometry: rebuilding the
    shard_map'd closure on every call would defeat jit's compile cache
    (measured: a 60 s recompile per call through the remote transport).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    body = partial(
        _device_body,
        K=K,
        n_dev=n_dev,
        cap=cap,
        axis=axis,
        use_pallas=use_pallas,
        interpret=interpret,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis), P(axis), P(axis)),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=not use_pallas,
    )
    return jax.jit(mapped)


def _shard_with_halo(arr: np.ndarray, n_dev: int, K: int):
    """Split bases into n_dev equal shards with K-1 right halos.

    Pads the tail with 0x00 (an invalid byte -> masked windows), so every
    window of the original stream appears in exactly one shard.
    """
    L = arr.shape[0]
    shard = -(-L // n_dev)
    halo = K - 1
    padded = np.zeros(n_dev * shard + halo, dtype=np.uint8)
    padded[:L] = arr
    out = np.empty((n_dev, shard + halo), dtype=np.uint8)
    for d in range(n_dev):
        out[d] = padded[d * shard : d * shard + shard + halo]
    return out, shard


def sharded_canonical_count(
    data,
    config: ShardedCountConfig = ShardedCountConfig(),
    mesh: Mesh | None = None,
    metrics=None,
):
    """Count canonical K-mers across all devices of ``mesh``.

    Returns ``(kmers, counts)`` as sorted host numpy arrays (exact global
    multiset — parity with the single-chip pipeline and the scalar oracle).
    Raises on invalid bytes and on bucket overflow (raise ``bucket_factor``).
    ``metrics``: optional :class:`kmers_tpu.utils.Metrics` recording one
    BatchStats per call.
    """
    if metrics is not None:
        metrics.start_batch()
    if isinstance(data, str):
        data = data.encode("ascii")
    arr = np.frombuffer(bytes(data), dtype=np.uint8).copy()
    if mesh is None:
        mesh = data_mesh()
    n_dev = mesh.devices.size
    K = config.K
    L = arr.shape[0]
    if L < K:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)

    shards, shard = _shard_with_halo(arr, n_dev, K)
    n_win = shard + K - 1 - K + 1  # windows per shard == shard
    cap = int(np.ceil(n_win * config.bucket_factor / n_dev))
    use_pallas = (
        jax.default_backend() not in ("cpu",)
        if config.use_pallas is None
        else config.use_pallas
    )
    step = sharded_count_step(
        mesh, K, shard, cap, use_pallas, config.pallas_interpret
    )
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    shards_dev = jax.device_put(shards, sharding)
    uh, ul, cnt, nu, n_invalid, overflow = step(shards_dev)

    # padding bytes are 0x00 == invalid; discount them before erroring
    # (bodies cover [0, n_dev*shard) exactly once; pads there = n_dev*shard - L)
    pad = n_dev * shard - L
    if int(np.asarray(n_invalid)[0]) - pad > 0:
        from ..alphabets import EncodeError, DNAAlphabet2

        raise EncodeError(DNAAlphabet2(), "<batch input>")
    if int(np.asarray(overflow)[0]) > 0:
        raise RuntimeError(
            "hash-prefix bucket overflow; increase bucket_factor"
        )

    uh = np.asarray(uh).reshape(-1).astype(np.uint64)
    ul = np.asarray(ul).reshape(-1).astype(np.uint64)
    cnt = np.asarray(cnt).reshape(-1)
    kmers = (uh << np.uint64(32)) | ul
    keep = cnt > 0
    kmers, cnt = kmers[keep], cnt[keep].astype(np.int64)
    order = np.argsort(kmers, kind="stable")
    kmers, cnt = kmers[order], cnt[order]
    if metrics is not None:
        n_windows = max(L - K + 1, 0)
        counted = int(cnt.sum())
        metrics.end_batch(
            bases_in=L,
            windows_out=counted,
            windows_skipped=n_windows - counted,
            distinct_kmers=int(kmers.shape[0]),
        )
    return kmers, cnt

"""Count-table spill/restore between streaming batches (SURVEY.md §5).

Real k-mer counting exceeds HBM; tables checkpoint to .npz shards so a
streaming job can spill, resume, and merge deterministically.  Shards are
keyed by hash-prefix partition id so multi-host runs write without
coordination.

Two table encodings (chosen per partition by dtype):

- ``kmers`` uint64 — K <= 31 single-register tables;
- ``kmers_limbs`` (n, M) uint64 — K > 31 multi-limb registers (object
  arrays of Python ints), little-endian limb order, M = ceil(bits/64).

The manifest additionally records per-shard *input* provenance
(``inputs``: path, bytes, sha256) when the caller supplies it, so a
failed multi-host run can be re-executed deterministically on the same
shard assignment (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

__all__ = [
    "save_count_table",
    "load_count_table",
    "input_manifest_entry",
]

_MANIFEST = "manifest.json"


def input_manifest_entry(path) -> dict:
    """Provenance record of one input file: path, size, sha256.

    Hashing streams in 1 MiB blocks (inputs are genome-scale)."""
    p = Path(path)
    h = hashlib.sha256()
    size = 0
    with open(p, "rb") as f:
        while True:
            block = f.read(1 << 20)
            if not block:
                break
            h.update(block)
            size += len(block)
    return {"path": str(p), "bytes": size, "sha256": h.hexdigest()}


def _pack_limbs(kmers, K: int) -> np.ndarray:
    """Object array of Python ints -> (n, M) uint64 little-endian limbs."""
    bits = 2 * K
    M = -(-bits // 64)
    out = np.zeros((len(kmers), M), np.uint64)
    mask = (1 << 64) - 1
    for i, v in enumerate(kmers):
        v = int(v)
        for m in range(M):
            out[i, m] = (v >> (64 * m)) & mask
    return out


def _unpack_limbs(limbs: np.ndarray) -> np.ndarray:
    """(n, M) uint64 limbs -> object array of Python ints."""
    n, M = limbs.shape
    out = np.empty(n, object)
    for i in range(n):
        v = 0
        for m in range(M - 1, -1, -1):
            v = (v << 64) | int(limbs[i, m])
        out[i] = v
    return out


def save_count_table(
    directory,
    kmers: np.ndarray,
    counts: np.ndarray,
    K: int,
    partition: int = 0,
    n_partitions: int = 1,
    inputs=None,
):
    """Write one partition of a (kmers, counts) table + manifest.

    ``kmers``: uint64 (K <= 31) or an object array of Python ints
    (K > 31 multi-limb registers — stored as fixed-width limb arrays).
    ``inputs``: optional iterable of input file paths (or pre-built
    :func:`input_manifest_entry` dicts) recorded in the manifest for
    deterministic reruns.
    """
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    kmers = np.asarray(kmers)
    counts = np.asarray(counts, np.int64)
    if kmers.dtype == object:
        np.savez_compressed(
            d / f"part-{partition:05d}.npz",
            kmers_limbs=_pack_limbs(kmers, K),
            counts=counts,
        )
    else:
        np.savez_compressed(
            d / f"part-{partition:05d}.npz",
            kmers=kmers.astype(np.uint64),
            counts=counts,
        )
    manifest = {
        "K": K,
        "n_partitions": n_partitions,
        "format": "kmers_tpu.counts.v1",
    }
    if inputs is not None:
        manifest["inputs"] = [
            e if isinstance(e, dict) else input_manifest_entry(e)
            for e in inputs
        ]
    (d / _MANIFEST).write_text(json.dumps(manifest))


def load_count_table(directory, return_manifest: bool = False):
    """Load and merge every partition; returns (kmers, counts, K) sorted
    (plus the manifest dict with ``return_manifest``)."""
    d = Path(directory)
    manifest = json.loads((d / _MANIFEST).read_text())
    parts = sorted(d.glob("part-*.npz"))
    ks, cs = [], []
    for p in parts:
        with np.load(p) as z:
            if "kmers_limbs" in z:
                ks.append(_unpack_limbs(z["kmers_limbs"]))
            else:
                ks.append(z["kmers"])
            cs.append(z["counts"])
    # pairwise-merge partitions (duplicate kmers across streaming epochs
    # sum); uint64 tables use the native two-pointer merge, multi-limb
    # tables the object-dtype merge of pipelines.tables
    from ..pipelines.tables import merge_counts

    kmers = np.zeros(0, np.uint64)
    counts = np.zeros(0, np.int64)
    for k, c in zip(ks, cs):
        if k.dtype == object:
            order = np.argsort([int(v) for v in k], kind="stable")
        else:
            order = np.argsort(k, kind="stable")
        kmers, counts = merge_counts(kmers, counts, k[order], c[order])
    out = (kmers, counts, manifest["K"])
    return out + (manifest,) if return_manifest else out

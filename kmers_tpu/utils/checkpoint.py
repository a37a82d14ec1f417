"""Count-table spill/restore between streaming batches (SURVEY.md §5).

Real k-mer counting exceeds HBM; tables checkpoint to .npz shards so a
streaming job can spill, resume, and merge deterministically.  Shards are
keyed by hash-prefix partition id so multi-host runs write without
coordination.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

__all__ = ["save_count_table", "load_count_table"]

_MANIFEST = "manifest.json"


def save_count_table(
    directory,
    kmers: np.ndarray,
    counts: np.ndarray,
    K: int,
    partition: int = 0,
    n_partitions: int = 1,
):
    """Write one partition of a (kmers, counts) table + manifest."""
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        d / f"part-{partition:05d}.npz",
        kmers=np.asarray(kmers, np.uint64),
        counts=np.asarray(counts, np.int64),
    )
    manifest = {"K": K, "n_partitions": n_partitions, "format": "kmers_tpu.counts.v1"}
    (d / _MANIFEST).write_text(json.dumps(manifest))


def load_count_table(directory):
    """Load and merge every partition; returns (kmers, counts, K) sorted."""
    d = Path(directory)
    manifest = json.loads((d / _MANIFEST).read_text())
    parts = sorted(d.glob("part-*.npz"))
    ks, cs = [], []
    for p in parts:
        with np.load(p) as z:
            ks.append(z["kmers"])
            cs.append(z["counts"])
    # pairwise-merge partitions (duplicate kmers across streaming epochs
    # sum); the native two-pointer merge avoids numpy's unique+scatter
    # temporaries on large tables
    from ..io.fasta import merge_count_tables_native

    kmers = np.zeros(0, np.uint64)
    counts = np.zeros(0, np.int64)
    for k, c in zip(ks, cs):
        order = np.argsort(k, kind="stable")
        kmers, counts = merge_count_tables_native(
            kmers, counts, k[order], c[order]
        )
    return kmers, counts, manifest["K"]

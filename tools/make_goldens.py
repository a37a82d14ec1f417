"""Generate frozen golden fixtures for cross-plane regression testing.

The scalar plane is verified against reference-transliterated vectors
(fx_hash, as_integer, CodonSet masks); this tool freezes its outputs on
deterministic sequences into tests/fixtures/golden.json so that future
refactors of ANY plane are checked against immutable bytes, not against
code that might drift in lockstep.
"""

import json
import hashlib
from pathlib import Path

import numpy as np


def det_seq(seed: int, n: int, chars="ACGT") -> str:
    rng = np.random.default_rng(seed)
    return "".join(chars[i] for i in rng.integers(0, len(chars), n))


def main():
    import collections

    from kmers_tpu import (
        CanonicalDNAMers,
        DNAKmer,
        UnambiguousDNAMers,
        fx_hash,
        mer,
    )

    fixtures = {"version": 1, "cases": []}

    for seed, n, chars, K in [
        (1, 500, "ACGT", 31),
        (2, 1000, "ACGTN", 21),
        (3, 300, "ACGT", 7),
        (4, 2000, "ACGTNMRW", 15),
    ]:
        s = det_seq(seed, n, chars)
        counts = collections.Counter(
            k.canonical().value for k, _ in UnambiguousDNAMers(K, s)
        )
        items = sorted(counts.items())
        hashes = [fx_hash(DNAKmer(s[i : i + K])) for i in range(0, max(n - K + 1, 0), 97)
                  if all(c in "ACGT" for c in s[i : i + K])]
        fixtures["cases"].append(
            {
                "seed": seed,
                "n": n,
                "chars": chars,
                "K": K,
                "seq_sha256": hashlib.sha256(s.encode()).hexdigest(),
                "n_distinct": len(items),
                "total": sum(counts.values()),
                "first_kmers": [int(k) for k, _ in items[:8]],
                "first_counts": [int(c) for _, c in items[:8]],
                "counts_sha256": hashlib.sha256(
                    json.dumps(items).encode()
                ).hexdigest(),
                "sample_hashes": [int(h) for h in hashes[:8]],
            }
        )

    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    out.mkdir(parents=True, exist_ok=True)
    (out / "golden.json").write_text(json.dumps(fixtures, indent=1))
    print(f"wrote {out / 'golden.json'}")


if __name__ == "__main__":
    main()

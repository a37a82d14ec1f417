"""Frozen golden fixtures: both planes vs immutable stored vectors."""

import collections
import json
from pathlib import Path

import numpy as np
import pytest

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "golden.json").read_text()
)


def det_seq(seed, n, chars):
    rng = np.random.default_rng(seed)
    return "".join(chars[i] for i in rng.integers(0, len(chars), n))


@pytest.mark.parametrize("case", FIXTURES["cases"], ids=lambda c: f"seed{c['seed']}K{c['K']}")
class TestGoldens:
    def test_scalar_plane(self, case):
        import hashlib

        from kmers_tpu import UnambiguousDNAMers

        s = det_seq(case["seed"], case["n"], case["chars"])
        assert hashlib.sha256(s.encode()).hexdigest() == case["seq_sha256"]
        counts = collections.Counter(
            k.canonical().value for k, _ in UnambiguousDNAMers(case["K"], s)
        )
        items = sorted(counts.items())
        assert len(items) == case["n_distinct"]
        assert sum(counts.values()) == case["total"]
        assert [int(k) for k, _ in items[:8]] == case["first_kmers"]
        assert (
            hashlib.sha256(json.dumps(items).encode()).hexdigest()
            == case["counts_sha256"]
        )

    def test_array_plane(self, case):
        from kmers_tpu.pipelines import canonical_count

        s = det_seq(case["seed"], case["n"], case["chars"])
        kmers, counts = canonical_count(s, K=case["K"])
        assert kmers.size == case["n_distinct"]
        assert int(counts.sum()) == case["total"]
        assert kmers[:8].tolist() == case["first_kmers"]
        assert counts[:8].tolist() == case["first_counts"]

    def test_hashes(self, case):
        from kmers_tpu import DNAKmer, fx_hash

        s = det_seq(case["seed"], case["n"], case["chars"])
        K = case["K"]
        hashes = [
            fx_hash(DNAKmer(s[i : i + K]))
            for i in range(0, max(case["n"] - K + 1, 0), 97)
            if all(c in "ACGT" for c in s[i : i + K])
        ]
        assert [int(h) for h in hashes[:8]] == case["sample_hashes"]

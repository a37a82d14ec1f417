"""Hypothesis property tests: algebraic invariants of the scalar plane.

The reference relies on StableRNG-seeded random sweeps; property-based
testing explores the same invariants adversarially (shrinking to minimal
counterexamples).
"""

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from kmers_tpu import (
    AminoAcidAlphabet,
    DNAAlphabet2,
    DNAAlphabet4,
    Kmer,
    RNAAlphabet2,
    fx_hash,
)

dna2 = st.text(alphabet="ACGT", min_size=1, max_size=100)
dna4 = st.text(alphabet="ACGTMRSVWYHKDBN-", min_size=1, max_size=60)
aa = st.text(alphabet="ARNDCQEGHILKMFPSTWYVOUBJZX*", min_size=1, max_size=30)


class TestRegisterInvariants:
    @given(dna2)
    @settings(max_examples=200, deadline=None)
    def test_rc_involution_and_canonical(self, s):
        k = Kmer(DNAAlphabet2(), s)
        rc = k.reverse_complement()
        assert rc.reverse_complement() == k
        assert k.canonical() == rc.canonical() == min(k, rc)
        assert k.canonical().iscanonical()

    @given(dna4)
    @settings(max_examples=200, deadline=None)
    def test_rc_involution_4bit(self, s):
        k = Kmer(DNAAlphabet4(), s)
        assert k.reverse_complement().reverse_complement() == k
        assert str(k.reverse()) == s[::-1]

    @given(dna2)
    @settings(max_examples=200, deadline=None)
    def test_roundtrips(self, s):
        k = Kmer(DNAAlphabet2(), s)
        assert str(k) == s
        assert Kmer(DNAAlphabet2(), k.to_seq()) == k
        if k.bits <= 128:
            assert Kmer.from_integer(DNAAlphabet2(), len(s), k.as_integer()) == k

    @given(dna2, st.text(alphabet="ACGT", min_size=1, max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_shift_stream_equals_suffix(self, s, extra):
        K = len(s)
        k = Kmer(DNAAlphabet2(), s)
        for c in extra:
            k = k.shift(c)
        assert str(k) == (s + extra)[-K:]

    @given(dna2)
    @settings(max_examples=100, deadline=None)
    def test_push_pop_inverse(self, s):
        k = Kmer(DNAAlphabet2(), s)
        assert k.push("A").pop() == k
        assert k.push_first("C").pop_first() == k

    @given(aa)
    @settings(max_examples=100, deadline=None)
    def test_aa_ordering_is_lexicographic(self, s):
        # compare against the encoding-ordered tuple (symbol order)
        k1 = Kmer(AminoAcidAlphabet(), s)
        k2 = Kmer(AminoAcidAlphabet(), s[::-1])
        t1 = tuple(k1.extract_encoded_element(i) for i in range(len(s)))
        t2 = tuple(k2.extract_encoded_element(i) for i in range(len(s)))
        assert (k1 < k2) == (t1 < t2)
        assert (k1 == k2) == (t1 == t2)

    @given(dna2)
    @settings(max_examples=100, deadline=None)
    def test_dna_rna_equivalence(self, s):
        kd = Kmer(DNAAlphabet2(), s)
        kr = Kmer(RNAAlphabet2(), s.replace("T", "U"))
        assert kd == kr
        assert hash(kd) == hash(kr)
        assert fx_hash(kd) == fx_hash(kr)

    @given(dna2, st.integers(0, 99), st.integers(0, 99))
    @settings(max_examples=100, deadline=None)
    def test_slice_matches_string(self, s, a, b):
        k = Kmer(DNAAlphabet2(), s)
        a, b = min(a, len(s)), min(b, len(s))
        assert str(k[a:b]) == s[a:b]


class TestTranslationProperties:
    @given(st.text(alphabet="ACGU", min_size=3, max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_translate_reverse_translate(self, s):
        from kmers_tpu import RNAAlphabet2, reverse_translate

        s = s[: len(s) - len(s) % 3]
        k = Kmer(RNAAlphabet2(), s)
        aa = k.translate()
        sets = reverse_translate(aa)
        # every original codon must be in its amino acid's codon set
        for i, cs in enumerate(sets):
            codon = Kmer(RNAAlphabet2(), s[3 * i : 3 * i + 3])
            assert codon in cs


class TestPipelineProperties:
    """End-to-end array-plane invariants vs the scalar oracle."""

    @given(
        st.text(alphabet="ACGTN", min_size=1, max_size=300),
        st.integers(min_value=1, max_value=31),
    )
    @settings(max_examples=40, deadline=None)
    def test_counting_oracle(self, s, K):
        import collections

        import numpy as np

        from kmers_tpu import UnambiguousDNAMers
        from kmers_tpu.pipelines import canonical_count

        kmers, counts = canonical_count(s, K=K)
        oracle = collections.Counter(
            k.canonical().value for k, _ in UnambiguousDNAMers(K, s)
        )
        assert dict(zip(kmers.tolist(), counts.tolist())) == dict(oracle)
        assert np.array_equal(np.sort(kmers), kmers)

    @given(
        st.text(alphabet="ACGTNACGT", min_size=30, max_size=200),
        st.integers(min_value=2, max_value=9),
        st.integers(min_value=2, max_value=8),
    )
    @settings(max_examples=25, deadline=None)
    def test_minimizer_skip_oracle(self, s, K, W):
        from kmers_tpu import DNAKmer, fx_hash
        from kmers_tpu.pipelines import minimizer_select

        vals, pos = minimizer_select(s, K=K, W=W, skip_ambiguous=True)
        n = len(s) - K + 1
        cand = {}
        for i in range(max(n, 0)):
            win = s[i : i + K]
            if all(c in "ACGT" for c in win):
                kk = DNAKmer(win).canonical()
                cand[i] = (fx_hash(kk), i, kk.value)
        want = []
        for j in range(max(n - W + 1, 0)):
            xs = [cand[i] for i in range(j, j + W) if i in cand]
            if not xs:
                continue
            _, p, v = min(xs)
            if not want or want[-1][0] != p:
                want.append((p, v))
        assert pos.tolist() == [p for p, _ in want]
        assert vals.tolist() == [v for _, v in want]

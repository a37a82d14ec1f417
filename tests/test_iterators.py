"""Scalar iterator plane vs naive window reconstruction.

Mirrors the reference's naive-oracle strategy
(/root/reference/test/runtests.jl:740-747, 850-855).
"""

import pytest

from kmers_tpu import (
    CanonicalDNAMers,
    CanonicalKmers,
    DNAAlphabet2,
    DNAAlphabet4,
    EncodeError,
    FwAAMers,
    FwDNAMers,
    FwKmers,
    FwRNAMers,
    FwRvIterator,
    Kmer,
    RNAAlphabet2,
    RNAAlphabet4,
    Seq,
    SpacedDNAMers,
    SpacedKmers,
    UnambiguousDNAMers,
    UnambiguousKmers,
    UnambiguousRNAMers,
    each_codon,
    AminoAcidAlphabet,
    DNA,
    RNA,
)


def naive_windows(A, K, s):
    return [Kmer(A(), s[i : i + K]) for i in range(len(s) - K + 1)]


def random_dna(rng, n, chars="ACGT"):
    return "".join(chars[i] for i in rng.integers(0, len(chars), n))


class TestFwKmers:
    @pytest.mark.parametrize("K", [1, 3, 16, 31, 33, 41])
    def test_string_source(self, rng, K):
        s = random_dna(rng, 100)
        got = list(FwDNAMers(K, s))
        assert got == naive_windows(DNAAlphabet2, K, s)
        assert len(FwDNAMers(K, s)) == len(got)

    def test_short_source(self):
        assert list(FwDNAMers(5, "ACG")) == []
        assert len(FwDNAMers(5, "ACG")) == 0

    def test_seq_sources(self, rng):
        s = random_dna(rng, 60)
        seq2 = Seq(DNAAlphabet2(), s)
        seq4 = Seq(DNAAlphabet4(), s)
        want = naive_windows(DNAAlphabet2, 7, s)
        assert list(FwKmers(DNAAlphabet2(), 7, seq2)) == want  # Copyable
        assert list(FwKmers(DNAAlphabet2(), 7, seq4)) == want  # FourToTwo
        # TwoToFour
        got = list(FwKmers(DNAAlphabet4(), 7, seq2))
        assert [str(k) for k in got] == [s[i : i + 7] for i in range(len(s) - 6)]

    def test_rna_aa(self, rng):
        s = random_dna(rng, 50, "ACGU")
        assert list(FwRNAMers(4, s)) == naive_windows(RNAAlphabet2, 4, s)
        aa = random_dna(rng, 50, "ACDEFGHIKLMNPQRSTVWY")
        assert list(FwAAMers(4, aa)) == naive_windows(AminoAcidAlphabet, 4, aa)

    def test_ambiguous_errors(self):
        it = FwDNAMers(3, "ACGTNACGT")
        out = []
        with pytest.raises(EncodeError):
            for k in it:
                out.append(k)
        # lazy: kmers before the bad symbol were yielded
        assert [str(k) for k in out] == ["ACG", "CGT"]

    def test_invalid_k(self):
        with pytest.raises(ValueError):
            FwDNAMers(0, "ACGT")


class TestFwRvAndCanonical:
    def test_doctest(self):
        got = list(FwRvIterator(DNAAlphabet4(), 3, "AGCGT"))
        assert [(str(a), str(b)) for a, b in got] == [
            ("AGC", "GCT"), ("GCG", "CGC"), ("CGT", "ACG")]
        got = list(CanonicalKmers(RNAAlphabet2(), 3, "AGCGA"))
        assert [str(k) for k in got] == ["AGC", "CGC", "CGA"]

    @pytest.mark.parametrize("A", [DNAAlphabet2, DNAAlphabet4, RNAAlphabet2, RNAAlphabet4])
    @pytest.mark.parametrize("K", [1, 4, 31, 33])
    def test_naive_fwrv(self, rng, A, K):
        chars = "ACGT" if "DNA" in A.__name__ else "ACGU"
        s = random_dna(rng, 80, chars)
        naive = [
            (k, k.reverse_complement()) for k in naive_windows(A, K, s)
        ]
        assert list(FwRvIterator(A(), K, s)) == naive
        assert list(CanonicalKmers(A(), K, s)) == [min(f, r) for f, r in naive]

    def test_seq_sources(self, rng):
        s = random_dna(rng, 60)
        for SA in [DNAAlphabet2, DNAAlphabet4]:
            seq = Seq(SA(), s)
            for A in [DNAAlphabet2, DNAAlphabet4]:
                naive = [
                    (k, k.reverse_complement()) for k in naive_windows(A, 9, s)
                ]
                assert list(FwRvIterator(A(), 9, seq)) == naive

    def test_ambiguous_4bit_ok(self):
        # 4-bit canonical handles ambiguity codes via symbol complement
        got = list(FwRvIterator(DNAAlphabet4(), 3, "AWN-G"))
        assert [(str(a), str(b)) for a, b in got] == [
            ("AWN", "NWT"), ("WN-", "-NW"), ("N-G", "C-N")]


class TestUnambiguous:
    def test_doctest(self):
        got = list(UnambiguousRNAMers(4, Seq(DNAAlphabet4(), "TGAGCWKCATC")))
        assert [(str(k), i) for k, i in got] == [
            ("UGAG", 0), ("GAGC", 1), ("CAUC", 7)]

    def test_ascii_skipping(self):
        got = list(UnambiguousDNAMers(4, "TGAGCWKCATC"))
        assert [(str(k), i) for k, i in got] == [
            ("TGAG", 0), ("GAGC", 1), ("CATC", 7)]
        # gaps are skipped too (ASCII_SKIPPING_LUT includes '-')
        got = list(UnambiguousDNAMers(2, "AC-GT"))
        assert [(str(k), i) for k, i in got] == [("AC", 0), ("GT", 3)]

    def test_invalid_byte_errors(self):
        with pytest.raises(EncodeError):
            list(UnambiguousDNAMers(2, "ACXGT"))

    def test_len_two_bit_source(self):
        # 2-bit sources cannot contain ambiguity -> length is known
        # (/root/reference/src/iterators/UnambiguousKmers.jl:33-37)
        s = Seq(DNAAlphabet2(), "TGAGCTACGGA")
        it = UnambiguousDNAMers(4, s)
        assert len(it) == len(list(it)) == 8
        assert len(UnambiguousDNAMers(20, s)) == 0
        # other sources are SizeUnknown -> len() raises
        with pytest.raises(TypeError):
            len(UnambiguousDNAMers(4, "TGAGCWKCATC"))
        with pytest.raises(TypeError):
            len(UnambiguousDNAMers(4, Seq(DNAAlphabet4(), "TGAGC")))

    def test_no_ambiguity_equals_fw(self, rng):
        s = random_dna(rng, 60)
        got = list(UnambiguousDNAMers(5, s))
        fw = list(FwDNAMers(5, s))
        assert [k for k, _ in got] == fw
        assert [i for _, i in got] == list(range(len(fw)))

    def test_naive_oracle(self, rng):
        # windows containing ambiguity are exactly the skipped ones
        chars = "ACGTNMRW"
        for _ in range(10):
            s = random_dna(rng, 50, chars)
            got = list(UnambiguousDNAMers(4, s))
            want = [
                (Kmer(DNAAlphabet2(), s[i : i + 4]), i)
                for i in range(len(s) - 3)
                if all(c in "ACGT" for c in s[i : i + 4])
            ]
            assert got == want

    def test_requires_two_bit(self):
        with pytest.raises(TypeError):
            UnambiguousKmers(DNAAlphabet4(), 3, "ACGT")


class TestSpaced:
    def test_doctest(self):
        assert [str(k) for k in SpacedDNAMers(3, 2, "AGCGTATA")] == [
            "AGC", "CGT", "TAT"]
        assert [str(k) for k in each_codon(DNA, "TGACGATCGAC")] == [
            "TGA", "CGA", "TCG"]

    @pytest.mark.parametrize("K,J", [(3, 1), (3, 3), (3, 5), (5, 3), (31, 7), (16, 16)])
    def test_naive(self, rng, K, J):
        s = random_dna(rng, 100)
        got = list(SpacedDNAMers(K, J, s))
        want = [
            Kmer(DNAAlphabet2(), s[i : i + K])
            for i in range(0, len(s) - K + 1, J)
        ]
        assert got == want
        assert len(SpacedDNAMers(K, J, s)) == len(want)

    def test_gap_symbols_unread_when_j_ge_k(self):
        # with J >= K, symbols between windows are never validated
        # (/root/reference/src/iterators/SpacedKmers.jl:121-139)
        s = "ACGT!?ACGT"
        got = [str(k) for k in SpacedDNAMers(4, 6, s)]
        assert got == ["ACGT", "ACGT"]

    def test_each_codon_seq(self, rng):
        s = random_dna(rng, 31)
        assert list(each_codon(Seq(DNAAlphabet2(), s))) == list(
            SpacedDNAMers(3, 3, s)
        )
        assert [str(k) for k in each_codon(Seq(RNAAlphabet4(), "AUGCCG"))] == [
            "AUG", "CCG"]


class TestEdgeCases:
    def test_unconvertible_alphabet(self, rng):
        # AA iterator over a DNA Seq: generic recoding fails lazily
        from kmers_tpu import AminoAcidAlphabet, EncodeError, FwKmers, Seq, DNAAlphabet4

        seq = Seq(DNAAlphabet4(), "TAGWN")
        it = FwKmers(AminoAcidAlphabet(), 3, seq)
        with pytest.raises(EncodeError):
            list(it)

    def test_smaller_than_k_all_iterators(self):
        from kmers_tpu import (
            CanonicalDNAMers,
            FwDNAMers,
            FwRvIterator,
            SpacedDNAMers,
            UnambiguousDNAMers,
            DNAAlphabet2,
        )

        s = "ACG"
        assert list(FwDNAMers(5, s)) == []
        assert list(CanonicalDNAMers(5, s)) == []
        assert list(FwRvIterator(DNAAlphabet2(), 5, s)) == []
        assert list(UnambiguousDNAMers(5, s)) == []
        assert list(SpacedDNAMers(5, 2, s)) == []

    def test_printing(self):
        from kmers_tpu import Seq, DNAAlphabet4, RNAAlphabet4, AminoAcidAlphabet, mer

        for s, want in [
            (mer("", "d"), ""),
            (Seq(DNAAlphabet4(), "TGASWKHVAAN--A"), "TGASWKHVAAN--A"),
            (Seq(RNAAlphabet4(), "UAGUCUYMNS"), "UAGUCUYMNS"),
            (Seq(AminoAcidAlphabet(), "LKHWSYYVQN"), "LKHWSYYVQN"),
        ]:
            assert str(s) == want

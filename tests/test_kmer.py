"""Scalar Kmer plane: construction, geometry, comparison, mutation ops.

Test vectors transliterated from the reference's test suite and doctests
(/root/reference/test/runtests.jl, /root/reference/src/kmer.jl) — the
vectors, not the code.
"""

import numpy as np
import pytest

from kmers_tpu import (
    AAKmer,
    AminoAcidAlphabet,
    CharAlphabet,
    DNA,
    DNAAlphabet2,
    DNAAlphabet4,
    DNAKmer,
    EncodeError,
    Kmer,
    RNA,
    RNAAlphabet2,
    RNAAlphabet4,
    RNAKmer,
    Seq,
    mer,
)
from kmers_tpu.kmer import fx_hash, n_words

ALPHABETS = [DNAAlphabet2, DNAAlphabet4, RNAAlphabet2, RNAAlphabet4, AminoAcidAlphabet]


def random_seq(rng, alphabet, n):
    if alphabet is AminoAcidAlphabet:
        chars = "ARNDCQEGHILKMFPSTWYVOUBJZX"
    elif alphabet in (DNAAlphabet2, DNAAlphabet4):
        chars = "ACGT"
    else:
        chars = "ACGU"
    return "".join(chars[i] for i in rng.integers(0, len(chars), n))


class TestConstruction:
    def test_from_string(self):
        k = RNAKmer("ACGUC")
        assert len(k) == 5 and str(k) == "ACGUC"
        k = Kmer(DNAAlphabet4(), "TGCTTA")
        assert str(k) == "TGCTTA"

    def test_from_generator(self):
        k = AAKmer((c.lower() for c in "KLWYR"))
        assert str(k) == "KLWYR"

    def test_wrong_length(self):
        with pytest.raises(ValueError):
            RNAKmer("UAUC", K=3)
        with pytest.raises(ValueError):
            Kmer(DNAAlphabet2(), (c for c in "ACGT"), K=3)

    def test_invalid_symbols(self):
        with pytest.raises(EncodeError):
            DNAKmer("ACGN")  # ambiguous in 2-bit
        with pytest.raises(EncodeError):
            DNAKmer("ACGU")  # U not in DNA 2-bit ascii set
        with pytest.raises(EncodeError):
            RNAKmer("ACGT")
        with pytest.raises(EncodeError):
            AAKmer("AC!")

    def test_case_insensitive(self):
        assert DNAKmer("acgt") == DNAKmer("ACGT")
        assert AAKmer("klwyr") == AAKmer("KLWYR")

    def test_from_seq_copyable(self):
        s = Seq(DNAAlphabet4(), "TAGWKN-C")
        k = Kmer(DNAAlphabet4(), s)
        assert str(k) == "TAGWKN-C"

    def test_four_to_two(self):
        s = Seq(DNAAlphabet4(), "TAGC")
        assert str(Kmer(DNAAlphabet2(), s)) == "TAGC"
        with pytest.raises(EncodeError):
            Kmer(DNAAlphabet2(), Seq(DNAAlphabet4(), "TAGN"))

    def test_two_to_four(self):
        s = Seq(DNAAlphabet2(), "TAGC")
        k = Kmer(DNAAlphabet4(), s)
        assert str(k) == "TAGC"
        assert k.extract_encoded_element(0) == 0b1000  # one-hot T

    def test_cross_nucleic_copyable(self):
        # DNA2 <-> RNA2 share encodings (construction.jl:16-24)
        d = DNAKmer("TACG")
        r = Kmer(RNAAlphabet2(), d)
        assert str(r) == "UACG" and r.value == d.value

    def test_mer_literal(self):
        assert str(mer("UGCUA", "r")) == "UGCUA"
        assert str(mer("YKVSTEDLLKKR", "a")) == "YKVSTEDLLKKR"
        assert str(mer("TATTAGCA", "dna")) == "TATTAGCA"
        with pytest.raises(ValueError):
            mer("TAG", "x")

    def test_char_alphabet_generic(self):
        k = Kmer(CharAlphabet(), "中国¨Å!")
        assert str(k) == "中国¨Å!"
        assert len(k) == 5 and k.nsize == 3

    def test_empty(self):
        k = mer("", "d")
        assert len(k) == 0 and k.value == 0 and k.nsize == 0


class TestGeometry:
    @pytest.mark.parametrize("A,K,N", [
        (DNAAlphabet2, 1, 1), (DNAAlphabet2, 32, 1), (DNAAlphabet2, 33, 2),
        (DNAAlphabet4, 16, 1), (DNAAlphabet4, 17, 2),
        (AminoAcidAlphabet, 8, 1), (AminoAcidAlphabet, 9, 2),
        (CharAlphabet, 2, 1), (CharAlphabet, 3, 2),
    ])
    def test_n_words(self, A, K, N):
        assert n_words(A(), K) == N

    def test_words_layout(self):
        # unused bits are the top bits of the first word (kmer.jl:33-44)
        k = AAKmer("KWPQHVYAB")  # 9 AAs = 72 bits -> N=2
        w = k.words
        assert len(w) == 2
        assert w[0] >> 8 == 0  # 56 unused top bits zero
        # last 8 symbols pack into the second word
        assert w[1] == int.from_bytes(bytes(k.to_seq().codes[1:]), "big")


class TestComparison:
    def test_lexicographic(self):
        assert DNAKmer("AC") < DNAKmer("AG") < DNAKmer("CA") < DNAKmer("TT")
        assert sorted([DNAKmer("TA"), DNAKmer("AT"), DNAKmer("CC")]) == [
            DNAKmer("AT"), DNAKmer("CC"), DNAKmer("TA")]

    def test_cross_k(self):
        # common prefix, then shorter < longer (kmer.jl:176-190)
        assert DNAKmer("AC") < DNAKmer("ACA")
        assert DNAKmer("ACT") > DNAKmer("AC")
        assert DNAKmer("AG") > DNAKmer("ACA")
        assert DNAKmer("AC") != DNAKmer("ACA")

    def test_cross_alphabet_allowed(self):
        assert DNAKmer("TACG") == RNAKmer("UACG")
        assert Kmer(DNAAlphabet4(), "TACG") == Kmer(RNAAlphabet4(), "UACG")

    def test_cross_alphabet_forbidden(self):
        with pytest.raises(TypeError):
            DNAKmer("TACG") == Kmer(DNAAlphabet4(), "TACG")
        with pytest.raises(TypeError):
            DNAKmer("TA") < AAKmer("TA")

    def test_eq_non_kmer_sequence_errors(self):
        with pytest.raises(TypeError):
            DNAKmer("TACG") == Seq(DNAAlphabet2(), "TACG")

    def test_hash_consistency(self):
        assert hash(DNAKmer("TACG")) == hash(RNAKmer("UACG"))
        assert len({DNAKmer("TACG"), RNAKmer("UACG")}) == 1


class TestFxHash:
    def test_goldens(self):
        # /root/reference/test/runtests.jl:901-914
        for k, h in [
            (mer("TAG", "a"), 0x55DBBE22BB3E4A13),
            (mer("KPWAK", "a"), 0x10203D1C885B7467),
            (mer("TAGCTAG", "d"), 0xA76409341339D05A),
            (mer("", "a"), 0),
            (mer("", "r"), 0),
            (mer("UGAUGCA", "r"), 0xDD7C97AE4CA204B4),
        ]:
            assert fx_hash(k) == h

    def test_seeded(self):
        k = mer("KWQLDE", "a")
        assert fx_hash(k) != fx_hash(k, 1)
        assert fx_hash(k) == fx_hash(k, 0)


class TestAsInteger:
    def test_goldens(self):
        assert mer("AACT", "d").as_integer() == 0x07
        assert mer("CT", "d").as_integer() == 0x07
        assert mer("KWPQHVY", "a").as_integer() == 0x000B110E05081312
        assert (
            mer("VEEKEGVLIKLRK", "a").as_integer()
            == 0x0000001306060B0607130A090B0A010B
        )

    def test_smallest_dtype(self):
        assert isinstance(mer("AACT", "d").as_integer(), np.uint8)
        assert isinstance(mer("ACGTA", "d").as_integer(), np.uint16)
        assert isinstance(mer("TGATCGTAGAGTGTA", "d").as_integer(), np.uint32)
        assert isinstance(mer("A" * 32, "d").as_integer(), np.uint64)
        assert isinstance(AAKmer("A" * 16).as_integer(), int)
        with pytest.raises(ValueError):
            AAKmer("A" * 17).as_integer()
        assert mer("", "d").as_integer() == 0

    def test_roundtrip(self, rng):
        for A in ALPHABETS:
            bps = A().bits_per_symbol
            for K in [1, 3, 7, 128 // bps]:
                s = random_seq(rng, A, K)
                k = Kmer(A(), s)
                u = k.as_integer()
                k2 = Kmer.from_integer(A(), K, u)
                assert k2 == k
                # widening the integer must not change the result
                assert Kmer.from_integer(A(), K, int(u)) == k


class TestMutationOps:
    def test_push_family(self):
        assert str(mer("UGCUGA", "r").push(RNA.G)) == "UGCUGAG"
        assert str(mer("W", "a").push("E")) == "WE"
        assert str(mer("GCU", "r").push_first(RNA.G)) == "GGCU"
        assert str(mer("W", "a").push_first("E")) == "EW"

    def test_shift_family(self):
        assert str(mer("TACC", "d").shift(DNA.A)) == "ACCA"
        assert str(mer("WKYMLPIIRS", "a").shift("F")) == "KYMLPIIRSF"
        assert str(mer("TACC", "d").shift_first(DNA.A)) == "ATAC"
        assert str(mer("WKYMLPIIRS", "a").shift_first("F")) == "FWKYMLPIIR"

    def test_pop_family(self):
        assert str(mer("TCTGTA", "d").pop()) == "TCTGT"
        assert str(mer("QPSY", "a").pop()) == "QPS"
        assert str(mer("TCTGTA", "d").pop_first()) == "CTGTA"
        assert str(mer("QPSY", "a").pop_first()) == "PSY"
        with pytest.raises(ValueError):
            mer("", "a").pop()
        with pytest.raises(ValueError):
            mer("", "a").pop_first()

    def test_multiword_roll(self, rng):
        # rolling across the 64-bit word boundary (tuple_bitflipping.jl carry)
        s = random_seq(rng, DNAAlphabet2, 100)
        k = DNAKmer(s[:40])
        for i, c in enumerate(s[40:], start=40):
            k = k.shift(c)
            assert str(k) == s[i - 39 : i + 1]

    def test_shift_encoding(self):
        # construction_utils.jl docstring: shift DNA_Y (enc 0x0a) into TAGA
        k = Kmer(DNAAlphabet4(), "TAGA")
        assert str(k.shift_encoding(0x0A)) == "AGAY"


class TestIndexing:
    def test_scalar(self):
        k = mer("TACGA", "d")
        assert k[0] == DNA.T and k[4] == DNA.A and k[-1] == DNA.A
        assert k[1] == DNA.A
        with pytest.raises(IndexError):
            k[5]

    def test_slice(self):
        k = mer("TACGA", "d")
        assert str(k[1:4]) == "ACG"
        assert str(k[:]) == "TACGA"
        assert len(k[2:2]) == 0

    def test_fancy(self):
        k = mer("TACGA", "d")
        assert str(k[[0, 2, 4]]) == "TCA"
        assert str(k[[True, False, True, False, True]]) == "TCA"
        assert str(k[[4, 3, 2, 1, 0]]) == "AGCAT"
        with pytest.raises(IndexError):
            k[[0, 9]]

    def test_setindex(self):
        k = mer("TACGA", "d")
        assert str(k.setindex(1, DNA.G)) == "TGCGA"
        assert str(k.setindex(0, "C")) == "CACGA"
        assert str(k) == "TACGA"  # immutable

    def test_multiword_slice(self, rng):
        s = random_seq(rng, AminoAcidAlphabet, 20)  # 160 bits, 3 words
        k = AAKmer(s)
        for a, b in [(0, 20), (3, 17), (5, 9), (12, 20), (0, 8)]:
            assert str(k[a:b]) == s[a:b]


class TestConversions:
    def test_to_seq_roundtrip(self, rng):
        for A in ALPHABETS:
            s = random_seq(rng, A, 37)
            k = Kmer(A(), s)
            seq = k.to_seq()
            assert str(seq) == s
            assert Kmer(A(), seq) == k

    def test_recode(self):
        k = DNAKmer("TACG")
        k4 = k.recode(DNAAlphabet4())
        assert str(k4) == "TACG"
        assert k.recode(RNAAlphabet2()) == RNAKmer("UACG")


class TestCounting:
    def test_gc_goldens(self):
        assert mer("TATCGGAGA", "d").count_gc() == 4
        assert mer("TATATATAAAAA", "d").count_gc() == 0
        assert (
            mer("AGCGATGCTGATGAGAGAGTCGTGTCGCTGTGATGATGAGGAGCTTAG", "d").count_gc()
            == 25
        )
        assert mer("AUGUCGUAG", "r").count_gc() == 4
        assert mer("", "r").count_gc() == 0
        assert (
            mer("AUGUCGGAGAGGAGCGAGAGAGGGCGCGGAUGUAGUGGCUGUAGGAG", "r").count_gc()
            == 29
        )
        with pytest.raises(TypeError):
            mer("ATATA", "a").count_gc()

    def test_gc_vs_oracle(self, rng):
        for _ in range(20):
            s = random_seq(rng, DNAAlphabet2, int(rng.integers(1, 96)))
            k = DNAKmer(s)
            assert k.count_gc() == sum(c in "GC" for c in s)
            k4 = Kmer(DNAAlphabet4(), s)
            assert k4.count_gc() == sum(c in "GC" for c in s)

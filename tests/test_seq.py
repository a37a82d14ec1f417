"""Seq (LongSequence analogue) API coverage."""

import numpy as np
import pytest

from kmers_tpu import (
    AminoAcidAlphabet,
    DNA,
    DNAAlphabet2,
    DNAAlphabet4,
    EncodeError,
    RNAAlphabet4,
    Seq,
)


class TestSeqBasics:
    def test_construction_sources(self):
        s = Seq(DNAAlphabet4(), "TAGWN-")
        assert str(s) == "TAGWN-" and len(s) == 6
        assert Seq(DNAAlphabet4(), s) == s
        assert Seq(DNAAlphabet4(), [DNA.T, DNA.A, "G", DNA.W, "n", "-"]) == s
        assert Seq(DNAAlphabet4(), b"TAGWN-") == s

    def test_recode_across_alphabets(self):
        s2 = Seq(DNAAlphabet2(), "TAGC")
        s4 = Seq(DNAAlphabet4(), s2)
        assert str(s4) == "TAGC"
        assert list(s4.codes) == [8, 1, 4, 2]
        with pytest.raises(EncodeError):
            Seq(DNAAlphabet2(), Seq(DNAAlphabet4(), "TAGN"))

    def test_indexing(self):
        s = Seq(DNAAlphabet4(), "TAGWN")
        assert s[0] == DNA.T and s[-1] == DNA.N
        assert str(s[1:4]) == "AGW"
        assert str(s[[0, 2, 4]]) == "TGN"
        assert str(s[np.array([True, False, True, False, True])]) == "TGN"

    def test_equality_and_hash(self):
        a = Seq(DNAAlphabet2(), "ACGT")
        b = Seq(DNAAlphabet2(), "ACGT")
        assert a == b and hash(a) == hash(b)
        assert a != Seq(DNAAlphabet2(), "ACGA")
        # different alphabet type: not equal (distinct encodings)
        assert a != Seq(DNAAlphabet4(), "ACGT")

    def test_invalid_input(self):
        with pytest.raises(EncodeError):
            Seq(DNAAlphabet2(), "ACGN")
        with pytest.raises(EncodeError):
            Seq(AminoAcidAlphabet(), "AC!")

    def test_immutability(self):
        s = Seq(DNAAlphabet2(), "ACGT")
        with pytest.raises(AttributeError):
            s.codes = None
        with pytest.raises(ValueError):
            s.codes[0] = 1  # read-only numpy array


class TestSeqBioOps:
    def test_complement_reverse(self):
        s = Seq(RNAAlphabet4(), "UAGWN-")
        assert str(s.complement()) == "AUCWN-"
        assert str(s.reverse()) == "-NWGAU"
        assert str(s.reverse_complement()) == "-NWCUA"
        assert s.reverse_complement().reverse_complement() == s

    def test_canonical(self):
        s = Seq(DNAAlphabet2(), "TTTT")
        assert str(s.canonical()) == "AAAA"
        assert not s.iscanonical()
        assert s.canonical().iscanonical()

    def test_cannot_complement_aa(self):
        with pytest.raises(TypeError):
            Seq(AminoAcidAlphabet(), "KW").complement()

    def test_translate_errors(self):
        from kmers_tpu import TranslationError

        with pytest.raises(TranslationError):
            Seq(DNAAlphabet2(), "ACGT").translate()
        with pytest.raises(TypeError):
            Seq(AminoAcidAlphabet(), "KWW").translate()

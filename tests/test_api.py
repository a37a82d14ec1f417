"""API-surface parity with the reference's export list.

Every name exported by /root/reference/src/Kmers.jl:10-76 (plus the
public-but-unexported construction utilities, :78-93) must have a
top-level equivalent here, and the new kind/type helpers must behave.
"""

import numpy as np
import pytest

import kmers_tpu as kt


# reference export -> our top-level name (identical unless noted)
REFERENCE_EXPORTS = {
    "Kmer": "Kmer",
    "Mer": "Mer",
    "DNAKmer": "DNAKmer",
    "RNAKmer": "RNAKmer",
    "AAKmer": "AAKmer",
    "DNACodon": "DNACodon",
    "RNACodon": "RNACodon",
    "ReverseGeneticCode": "ReverseGeneticCode",
    "reverse_translate": "reverse_translate",
    "reverse_translate!": "reverse_translate_into",
    "@mer_str": "mer",
    "fx_hash": "fx_hash",
    "derive_type": "derive_type",
    "as_integer": "as_integer",
    "from_integer": "from_integer",
    "push": "push",
    "push_first": "push_first",
    "shift": "shift",
    "shift_first": "shift_first",
    "pop": "pop",
    "pop_first": "pop_first",
    "FwKmers": "FwKmers",
    "FwDNAMers": "FwDNAMers",
    "FwRNAMers": "FwRNAMers",
    "FwAAMers": "FwAAMers",
    "FwRvIterator": "FwRvIterator",
    "CanonicalKmers": "CanonicalKmers",
    "CanonicalDNAMers": "CanonicalDNAMers",
    "CanonicalRNAMers": "CanonicalRNAMers",
    "UnambiguousKmers": "UnambiguousKmers",
    "UnambiguousDNAMers": "UnambiguousDNAMers",
    "UnambiguousRNAMers": "UnambiguousRNAMers",
    "SpacedKmers": "SpacedKmers",
    "SpacedDNAMers": "SpacedDNAMers",
    "SpacedRNAMers": "SpacedRNAMers",
    "SpacedAAMers": "SpacedAAMers",
    "each_codon": "each_codon",
    "CodonSet": "CodonSet",
    "delete": "delete",
    # re-exports
    "NucleicAcid": "NucleicAcid",
    "DNA": "DNA",
    "RNA": "RNA",
    "AminoAcid": "AminoAcid",
    "Alphabet": "Alphabet",
    "BioSequence": "BioSequence",
    "NucleicAcidAlphabet": "NucleicAcidAlphabet",
    "AminoAcidAlphabet": "AminoAcidAlphabet",
    "DNAAlphabet": "DNAAlphabet",
    "RNAAlphabet": "RNAAlphabet",
    "translate": "translate",
    "complement": "complement",
    "reverse_complement": "reverse_complement",
    "canonical": "canonical",
    "iscanonical": "iscanonical",
    # public construction utilities (Kmers.jl:78-93)
    "unsafe_shift_from": "unsafe_shift_from",
    "shift_encoding": "shift_encoding",
    "unsafe_extract": "unsafe_extract",
    "RecodingScheme": "RecodingScheme",
    "Copyable": "Copyable",
    "TwoToFour": "TwoToFour",
    "FourToTwo": "FourToTwo",
    "AsciiEncode": "AsciiEncode",
    "GenericRecoding": "GenericRecoding",
}


def test_reference_export_list_covered():
    missing = [r for r, n in REFERENCE_EXPORTS.items() if not hasattr(kt, n)]
    assert not missing, f"missing top-level equivalents: {missing}"


class TestMerKind:
    def test_instancecheck(self):
        k = kt.mer("ACGTA")
        assert isinstance(k, kt.Mer)
        assert isinstance(k, kt.Mer[5])
        assert not isinstance(k, kt.Mer[4])
        assert not isinstance("ACGTA", kt.Mer)
        # any alphabet matches: the reference's Mer{K} = Kmer{<:Alphabet,K}
        assert isinstance(kt.AAKmer("KWYR"), kt.Mer[4])

    def test_not_constructible(self):
        with pytest.raises(TypeError):
            kt.Mer("ACGT")


class TestDeriveType:
    def test_roundtrip_and_geometry(self):
        T = kt.derive_type(kt.DNAAlphabet2, 31)
        assert T.N == 1 and T.K == 31
        k = T("A" * 31)
        assert kt.from_integer(T, kt.as_integer(k)) == k
        assert kt.from_integer(k, kt.as_integer(k)) == k  # Kmer as template
        assert T.zero() == T("A" * 31)

    def test_multiword(self):
        T = kt.derive_type(kt.AminoAcidAlphabet, 20)
        assert T.N == 3  # 160 bits -> 3 words
        k = T("ACDEFGHIKLMNPQRSTVWY")
        assert len(k.words) == 3

    def test_equality_hash(self):
        a = kt.derive_type(kt.DNAAlphabet2, 7)
        b = kt.derive_type(kt.DNAAlphabet2(), 7)
        assert a == b and hash(a) == hash(b)
        assert a != kt.derive_type(kt.RNAAlphabet2, 7)


class TestParametricAlphabets:
    def test_factories(self):
        assert kt.DNAAlphabet(2) is kt.DNAAlphabet2()
        assert kt.DNAAlphabet(4) is kt.DNAAlphabet4()
        assert kt.RNAAlphabet(2) is kt.RNAAlphabet2()
        assert kt.RNAAlphabet(4) is kt.RNAAlphabet4()
        with pytest.raises(ValueError):
            kt.DNAAlphabet(8)


class TestBioSequenceKind:
    def test_membership(self):
        assert isinstance(kt.mer("ACG"), kt.BioSequence)
        assert isinstance(kt.Seq(kt.DNAAlphabet4, "ACGN"), kt.BioSequence)
        assert not isinstance("ACG", kt.BioSequence)

    def test_not_constructible(self):
        with pytest.raises(TypeError):
            kt.BioSequence()


class TestNucleicAcidKind:
    def test_membership(self):
        assert isinstance(kt.DNA.A, kt.NucleicAcid)
        assert isinstance(kt.RNA.U, kt.NucleicAcid)
        assert not isinstance(kt.AminoAcid.coerce("K"), kt.NucleicAcid)


class TestReverseTranslateInto:
    def test_fills_and_resizes(self):
        dest = ["junk"]
        s = kt.AAKmer("KWM")
        out = kt.reverse_translate_into(dest, s)
        assert out is dest and len(dest) == 3
        assert dest == kt.reverse_translate(s)

    def test_empty(self):
        dest = [1, 2, 3]
        kt.reverse_translate_into(dest, kt.AAKmer(""))
        assert dest == []


def test_module_level_as_integer_matches_method():
    k = kt.mer("TAG")
    assert kt.as_integer(k) == k.as_integer()
    assert isinstance(kt.as_integer(k), np.uint8)

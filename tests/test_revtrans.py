"""CodonSet set-semantics and ReverseGeneticCode invariants.

Mirrors /root/reference/test/runtests.jl:557-634 and test/translation.jl
property tests: CodonSet behaves like a Python set; every codon in
reverse_translate(aa) forward-translates back to aa.
"""

import pytest

from kmers_tpu import (
    AminoAcid,
    CodonSet,
    Kmer,
    RNAAlphabet2,
    ReverseGeneticCode,
    mer,
    ncbi_trans_table,
    reverse_translate,
    rev_standard_genetic_code,
    AAKmer,
    Seq,
    AminoAcidAlphabet,
)


def rna(s):
    return mer(s, "r")


ALL_CODONS = [
    Kmer.unsafe(RNAAlphabet2(), 3, v) for v in range(64)
]

SAMPLE_SOURCES = [
    [rna("UAG"), rna("ACC"), rna("ACC"), rna("UGG")],
    [],
    [rna("AAA"), rna("ACC"), rna("AAA"), rna("UCA"), rna("UCC")],
    [rna("AGC"), rna("AGA"), rna("UUU")],
    [rna("AAC"), rna("AGG")],
    [rna("UUG")],
    ALL_CODONS,
    ALL_CODONS[::3],
]


class TestCodonSet:
    def test_empty(self):
        assert len(CodonSet()) == 0

    def test_vs_set(self):
        for src in SAMPLE_SOURCES:
            cs, s = CodonSet(src), set(src)
            assert len(cs) == len(s)
            assert set(cs) == s
            assert sorted(cs) == sorted(s)
            for c in s:
                assert c in cs
            if s:
                c = next(iter(s))
                assert set(cs.delete(c)) == s - {c}
            assert set(cs.push(rna("AAA"))) == s | {rna("AAA")}
            assert set(cs.filter(lambda c: c[0].char == "A")) == {
                c for c in s if c[0].char == "A"
            }

    def test_set_algebra(self):
        for si in SAMPLE_SOURCES:
            for sj in SAMPLE_SOURCES:
                ci, cj = CodonSet(si), CodonSet(sj)
                a, b = set(si), set(sj)
                assert set(ci | cj) == a | b
                assert set(ci & cj) == a & b
                assert set(ci - cj) == a - b
                assert set(ci ^ cj) == a ^ b
                assert ci.issubset(cj) == a.issubset(b)
                assert ci.isdisjoint(cj) == a.isdisjoint(b)

    def test_dna_coerced(self):
        assert mer("TAG", "d") in CodonSet([rna("UAG")])


class TestReverseGeneticCode:
    def test_goldens(self):
        # revtrans.jl doctest: aa"KWCL"
        v = reverse_translate(AAKmer("KWCL"))
        assert [s.x for s in v] == [
            0x0000000000000005,
            0x0400000000000000,
            0x0A00000000000000,
            0x50000000F0000000,
        ]
        # AA_W -> {UGG}
        assert set(reverse_translate(AminoAcid.W)) == {rna("UGG")}
        # AA_V (4th of MMLVQ) -> GU*
        assert set(reverse_translate(AAKmer("MMLVQ"))[3]) == {
            rna("GUA"), rna("GUC"), rna("GUG"), rna("GUU")
        }
        # SR1 code: E -> {GAA, GAG}
        code = ReverseGeneticCode(ncbi_trans_table[25])
        assert set(code[AminoAcid.E]) == {rna("GAA"), rna("GAG")}

    def test_gap_errors(self):
        with pytest.raises(ValueError):
            rev_standard_genetic_code[AminoAcid.Gap]

    def test_structure(self):
        code = rev_standard_genetic_code
        assert len(code) == 27
        items = list(code)
        assert [aa.code for aa, _ in items] == list(range(27))
        for aa, s in items:
            assert reverse_translate(aa) == s

    def test_forward_roundtrip(self):
        # every codon of an unambiguous AA translates back to it; unions for
        # ambiguous; U/O special-cased (runtests.jl:588-634)
        code = rev_standard_genetic_code
        seen = CodonSet()
        for aa, cset in code:
            if aa.isambiguous:
                bits = 0
                for codon in cset:
                    bits |= codon.translate()[0].compatbits
                assert bits == aa.compatbits & 0x000FFFFF
            elif aa in (AminoAcid.U, AminoAcid.O):
                # not produced by the forward code; single special codons
                assert len(cset) == 1
            else:
                assert cset.isdisjoint(seen)
                seen = seen | cset
                for codon in cset:
                    assert codon.translate()[0] == aa
        assert len(seen) == 64

    def test_custom_code_roundtrip(self):
        fw = ncbi_trans_table[24]  # pterobranchia mitochondrial
        code = ReverseGeneticCode(fw)
        skip = {AminoAcid.O, AminoAcid.U, AminoAcid.B, AminoAcid.J,
                AminoAcid.X, AminoAcid.Z}
        for aa, cset in code:
            if aa in skip:
                continue
            for codon in cset:
                assert codon.translate(code=fw)[0] == aa

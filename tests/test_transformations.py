"""reverse / complement / canonical / translate — against the Seq oracle.

Mirrors the reference's oracle strategy (kmer ops checked against
LongSequence results, /root/reference/test/runtests.jl:438-555).
"""

import pytest

from kmers_tpu import (
    AminoAcidAlphabet,
    DNAAlphabet2,
    DNAAlphabet4,
    Kmer,
    RNAAlphabet2,
    RNAAlphabet4,
    Seq,
    TranslationError,
    mer,
    ncbi_trans_table,
    standard_genetic_code,
)

NUC_ALPHABETS = [DNAAlphabet2, DNAAlphabet4, RNAAlphabet2, RNAAlphabet4]


def random_nuc(rng, alphabet, n, ambiguous=False):
    if ambiguous and alphabet().bits_per_symbol == 4:
        chars = "ACGTMRSVWYHKDBN" if "DNA" in alphabet.__name__ else "ACGUMRSVWYHKDBN"
        # weight certain bases higher, like the reference's sampler
        weights = [0.225] * 4 + [0.00909] * 11
        idx = rng.choice(len(chars), size=n, p=[w / sum(weights) for w in weights])
        return "".join(chars[i] for i in idx)
    chars = "ACGT" if "DNA" in alphabet.__name__ else "ACGU"
    return "".join(chars[i] for i in rng.integers(0, 4, n))


class TestReverseComplement:
    @pytest.mark.parametrize("A", NUC_ALPHABETS)
    @pytest.mark.parametrize("n", [1, 5, 31, 32, 33, 64, 100])
    def test_vs_oracle(self, rng, A, n):
        s = random_nuc(rng, A, n, ambiguous=True)
        k = Kmer(A(), s)
        seq = Seq(A(), s)
        assert str(k.reverse()) == str(seq.reverse())
        assert str(k.complement()) == str(seq.complement())
        assert str(k.reverse_complement()) == str(seq.reverse_complement())

    def test_involution(self, rng):
        for A in NUC_ALPHABETS:
            s = random_nuc(rng, A, 45)
            k = Kmer(A(), s)
            assert k.reverse_complement().reverse_complement() == k

    def test_canonical(self, rng):
        for A in NUC_ALPHABETS:
            for n in [1, 2, 31, 33]:
                s = random_nuc(rng, A, n)
                k = Kmer(A(), s)
                c = k.canonical()
                rc = k.reverse_complement()
                assert c == min(k, rc)
                assert c.iscanonical()
                assert k.canonical() == rc.canonical()  # strand neutrality

    def test_empty(self):
        k = mer("", "d")
        assert k.reverse_complement() == k and k.canonical() == k


class TestTranslation:
    def test_empty(self):
        assert str(mer("", "r").translate()) == ""
        assert str(mer("", "d").translate()) == ""

    def test_not_divisible(self):
        for s in ["U", "UGCA", "GUCGAUUGUC"]:
            with pytest.raises(TranslationError):
                mer(s, "r").translate()

    def test_gaps_error(self):
        with pytest.raises(TranslationError):
            Kmer(DNAAlphabet4(), "CTGA-C").translate()
        with pytest.raises(TranslationError):
            Kmer(RNAAlphabet4(), "UC-").translate()

    def test_aa_untranslatable(self):
        with pytest.raises(TypeError):
            mer("CCC", "a").translate()

    def test_fixed_sequences_vs_oracle(self):
        seqs = [
            "UCGUAGUUCGAUUCUAUGCUGUAGUGGCAA",
            "UCGUAGGCGUAUUGCGCAAAGCGC",
            "UGCUAGUGUUCGAAA",
            "UCGUUAGUAAAA",
        ]
        for s in seqs:
            for A in [DNAAlphabet4, RNAAlphabet2, DNAAlphabet2, RNAAlphabet4]:
                t = s.replace("U", "T") if "DNA" in A.__name__ else s
                k = Kmer(A(), t)
                seq = Seq(A(), t)
                assert str(k.translate()) == str(seq.translate())

    def test_ambiguous_vs_oracle(self):
        seqs = [
            "UGCUGAWKVUDUGWUGUDHUAGUGCNUBGKUGCMGGSWC",
            "UCGUAGUCKGUCGUYCUGAGGWUGCUGANNUGCUGA",
            "CAGGCCAGWGCUGSSSCUGSMGKYVUCUAS",
        ]
        for s in seqs:
            for A in [DNAAlphabet4, RNAAlphabet4]:
                t = s.replace("U", "T") if "DNA" in A.__name__ else s
                assert str(Kmer(A(), t).translate()) == str(Seq(A(), t).translate())

    def test_all_ambiguous_codons(self):
        # all 15^3 non-gap codons, kmer vs Seq oracle (runtests.jl:548-553)
        chars = "ACMGRSVUWYHKDBN"
        for i in chars:
            for j in chars:
                for k in chars:
                    m = Kmer(RNAAlphabet4(), i + j + k)
                    assert str(m.translate()) == str(
                        Seq(RNAAlphabet4(), i + j + k).translate()
                    )

    def test_disallow_ambiguous(self):
        with pytest.raises(TranslationError):
            Kmer(RNAAlphabet4(), "AUGCCGCMA").translate(
                allow_ambiguous_codons=False
            )
        # resolvable ambiguity is fine even when disallowed:
        # CUN always codes L
        assert str(
            Kmer(RNAAlphabet4(), "CUN").translate(allow_ambiguous_codons=False)
        ) == "L"

    def test_alternative_start(self, rng):
        for A in NUC_ALPHABETS:
            for n in [3, 15, 33]:
                s = random_nuc(rng, A, n)
                k = Kmer(A(), s)
                seq = Seq(A(), s)
                assert str(k.translate(alternative_start=True)) == str(
                    seq.translate(alternative_start=True)
                )
                t = str(k.translate(alternative_start=True))
                assert t[0] == "M"

    def test_random_vs_oracle(self, rng):
        for A in NUC_ALPHABETS:
            for n in [3, 15, 33, 66]:
                s = random_nuc(rng, A, n, ambiguous=True)
                assert str(Kmer(A(), s).translate()) == str(Seq(A(), s).translate())

    def test_alternative_codes(self, rng):
        for table_id in [2, 6, 21, 24, 25]:
            code = ncbi_trans_table[table_id]
            s = random_nuc(rng, RNAAlphabet2, 33)
            assert str(Kmer(RNAAlphabet2(), s).translate(code=code)) == str(
                Seq(RNAAlphabet2(), s).translate(code=code)
            )

    def test_known_code_differences(self):
        # UGA: stop in standard, W in vertebrate mito, G in SR1
        assert str(mer("UGA", "r").translate()) == "*"
        assert str(mer("UGA", "r").translate(code=ncbi_trans_table[2])) == "W"
        assert str(mer("UGA", "r").translate(code=ncbi_trans_table[25])) == "G"
        # AGA: R in standard, stop in vertebrate mito, S in pterobranchia (24)
        assert str(mer("AGA", "r").translate()) == "R"
        assert str(mer("AGA", "r").translate(code=ncbi_trans_table[2])) == "*"
        assert str(mer("AGA", "r").translate(code=ncbi_trans_table[24])) == "S"
        # AAA: K standard, N in trematode mito (21)
        assert str(mer("AAA", "r").translate(code=ncbi_trans_table[21])) == "N"

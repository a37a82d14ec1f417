"""Interface-conformance harness over alphabets x K.

The analogue of the reference running ``BioSequences.has_interface`` for
5 alphabets x K in {1, 9, 116} (/root/reference/test/runtests.jl:15-27),
plus the synthetic-alphabet fixtures that force the generic code paths
(runtests.jl:29-59): CharAlphabet (32-bit, multiword) and an 8-bit
nucleotide alphabet exercising the generic nucleotide complement.
"""

import numpy as np
import pytest

from kmers_tpu import (
    AminoAcidAlphabet,
    CharAlphabet,
    DNAAlphabet2,
    DNAAlphabet4,
    Kmer,
    NucleicAcidAlphabet,
    RNAAlphabet2,
    RNAAlphabet4,
    Seq,
)
from kmers_tpu.symbols import DNA


class GenericNucAlphabet(NucleicAcidAlphabet):
    """8-bit DNA alphabet: forces the generic (non-specialized) nucleotide
    paths, mirroring the reference's GenericNucAlphabet fixture."""

    bits_per_symbol = 8
    symbol_type = DNA
    ascii_table = None

    @property
    def symbols(self):
        return DNA._instances

    def encode(self, symbol):
        return DNA.coerce(symbol).code

    def decode(self, encoding):
        return DNA.from_code(encoding & 0xF)


ALPHABETS = [
    DNAAlphabet2,
    DNAAlphabet4,
    RNAAlphabet2,
    RNAAlphabet4,
    AminoAcidAlphabet,
    CharAlphabet,
    GenericNucAlphabet,
]
KS = [1, 9, 116]


def sample_symbols(alphabet, K, rng):
    if isinstance(alphabet, CharAlphabet):
        return [chr(int(c)) for c in rng.integers(32, 0x3000, K)]
    syms = alphabet.symbols
    return [syms[int(i)] for i in rng.integers(0, len(syms), K)]


@pytest.mark.parametrize("A", ALPHABETS)
@pytest.mark.parametrize("K", KS)
def test_container_interface(A, K, rng):
    alphabet = A()
    syms = sample_symbols(alphabet, K, rng)
    k = Kmer(alphabet, syms)

    # length / iteration / element access agree
    assert len(k) == K
    collected = list(k)
    assert len(collected) == K
    assert collected == [k[i] for i in range(K)]
    assert collected == syms if not isinstance(alphabet, CharAlphabet) else True
    if K:
        assert k[-1] == collected[-1]

    # round-trips
    assert Kmer(alphabet, k.to_seq()) == k
    assert Kmer(alphabet, collected) == k
    if K * alphabet.bits_per_symbol <= 128:
        assert Kmer.from_integer(alphabet, K, k.as_integer()) == k

    # slicing is consistent with iteration
    assert list(k[: K // 2]) == collected[: K // 2]
    assert list(k[K // 2 :]) == collected[K // 2 :]

    # register invariants: head padding zero, words reconstruct value
    assert k.value < (1 << (K * alphabet.bits_per_symbol)) if K else k.value == 0
    v = 0
    for w in k.words:
        v = (v << 64) | w
    assert v == k.value

    # ordering is lexicographic over symbols (compare to a rotated variant)
    if K > 1:
        other = Kmer(alphabet, collected[1:] + collected[:1])
        want = (collected > list(other)) - (collected < list(other))
        if not isinstance(alphabet, CharAlphabet):
            got = k.cmp(other)
            assert (got > 0) == (collected > list(other))


@pytest.mark.parametrize("K", [1, 9, 116])
def test_generic_nuc_complement(K, rng):
    A = GenericNucAlphabet()
    syms = sample_symbols(A, K, rng)
    k = Kmer(A, syms)
    assert list(k.complement()) == [s.complement() for s in syms]
    assert k.reverse_complement().reverse_complement() == k
    # canonical well-defined under generic complement
    assert k.canonical() == min(k, k.reverse_complement())


def test_char_alphabet_multiword(rng):
    # 116 chars x 32 bits = 58 words: exercises deep multiword paths
    s = "".join(chr(int(c)) for c in rng.integers(0x4E00, 0x9FFF, 116))
    k = Kmer(CharAlphabet(), s)
    assert str(k) == s
    assert str(k.reverse()) == s[::-1]
    assert str(k[13:77]) == s[13:77]
    assert k.nsize == 58

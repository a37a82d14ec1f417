"""Random kmer generation, mirroring the reference's RandomExt rules.

Distribution contract (/root/reference/ext/RandomExt.jl, docs/src/random.md):

- complete alphabets (2-bit nucleotides): uniform raw random coding bits;
- 4-bit nucleotide alphabets: uniform over the 4 unambiguous bases,
  generated as random one-hot nibbles;
- amino acids: uniform over the 20 proteogenic amino acids only;
- other (incomplete) alphabets: uniform over the alphabet's symbols.

``rand_kmer`` returns one scalar :class:`Kmer`; ``rand_kmers`` returns a
batch as a uint64 register array (the array-plane representation) for
test-data generation at scale.
"""

from __future__ import annotations

import numpy as np

from .alphabets import (
    Alphabet,
    AminoAcidAlphabet,
    DNAAlphabet4,
    RNAAlphabet4,
    DNAAlphabet2,
    RNAAlphabet2,
)
from .kmer import Kmer

__all__ = [
    "rand_kmer",
    "rand_kmers",
    "rand_kmers_device",
    "rand_symbol",
    "rand_from_kmer",
]

#: encodings of the 20 proteogenic amino acids (ACDEFGHIKLMNPQRSTVWY),
#: mirroring PROTEOGENIC_AA_ENCODINGS (/root/reference/ext/RandomExt.jl:28-34)
PROTEOGENIC_AA = np.array(
    [AminoAcidAlphabet().encode(c) for c in "ACDEFGHIKLMNPQRSTVWY"],
    dtype=np.uint8,
)


def _rng(rng):
    if rng is None:
        return np.random.default_rng()
    if isinstance(rng, (int, np.integer)):
        return np.random.default_rng(int(rng))
    return rng


def rand_symbol(alphabet: Alphabet, rng=None):
    """One uniformly random symbol of the alphabet (rand(::Kmer) analogue
    samples positions; this samples the alphabet)."""
    rng = _rng(rng)
    if isinstance(alphabet, AminoAcidAlphabet):
        return alphabet.decode(int(rng.choice(PROTEOGENIC_AA)))
    syms = alphabet.symbols
    return syms[int(rng.integers(len(syms)))]


def rand_from_kmer(kmer: Kmer, rng=None):
    """One symbol drawn uniformly from the kmer's positions — the
    ``rand(rng, ::Kmer)`` method of the reference
    (/root/reference/ext/RandomExt.jl:40-44), which samples an *element
    of the sequence*, not the alphabet."""
    rng = _rng(rng)
    return kmer[int(rng.integers(len(kmer)))]


def rand_kmer(alphabet, K: int, rng=None) -> Kmer:
    """One random K-mer under the reference's distribution rules."""
    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    rng = _rng(rng)
    vals = rand_kmers(alphabet, K, 1, rng)
    return Kmer.unsafe(alphabet, K, int(vals[0]))


def rand_kmers(alphabet, K: int, n: int, rng=None) -> np.ndarray:
    """``n`` random K-mer register values (uint64 array; requires
    K * bits_per_symbol <= 64 — use repeated :func:`rand_kmer` otherwise)."""
    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    rng = _rng(rng)
    bps = alphabet.bits_per_symbol
    bits = K * bps
    if bits > 64:
        raise NotImplementedError("rand_kmers supports K*bps <= 64")
    if K == 0:
        return np.zeros(n, np.uint64)
    if isinstance(alphabet, (DNAAlphabet2, RNAAlphabet2)):
        # complete alphabet: raw random coding bits
        raw = rng.integers(0, 2**64, n, dtype=np.uint64)
        mask = np.uint64((1 << bits) - 1)
        return raw & mask
    if isinstance(alphabet, (DNAAlphabet4, RNAAlphabet4)):
        # uniform unambiguous bases as one-hot nibbles
        two = rng.integers(0, 4, (n, K), dtype=np.uint64)
        nib = np.uint64(1) << two
        out = np.zeros(n, np.uint64)
        for i in range(K):
            out = (out << np.uint64(4)) | nib[:, i]
        return out
    if isinstance(alphabet, AminoAcidAlphabet):
        codes = rng.choice(PROTEOGENIC_AA, size=(n, K)).astype(np.uint64)
        out = np.zeros(n, np.uint64)
        for i in range(K):
            out = (out << np.uint64(8)) | codes[:, i]
        return out
    # incomplete/generic alphabet: sample symbols
    syms = alphabet.symbols
    idx = rng.integers(0, len(syms), (n, K))
    out = np.zeros(n, np.uint64)
    for i in range(K):
        enc = np.array(
            [alphabet.encode(syms[j]) for j in idx[:, i]], dtype=np.uint64
        )
        out = (out << np.uint64(bps)) | enc
    return out


def rand_kmers_device(key, alphabet, K: int, n: int):
    """Device-side batch of random K-mer registers as a (hi, lo) uint32
    pair, using ``jax.random`` — for generating test/benchmark workloads
    directly in HBM without a host round-trip.

    Same distribution rules as :func:`rand_kmers` for the supported
    alphabets (2-bit raw bits; 4-bit one-hot; amino acids proteogenic).
    """
    import jax
    import jax.numpy as jnp

    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    bps = alphabet.bits_per_symbol
    bits = K * bps
    if bits > 64:
        raise NotImplementedError("rand_kmers_device supports K*bps <= 64")
    if isinstance(alphabet, (DNAAlphabet2, RNAAlphabet2)):
        hi = jax.random.bits(jax.random.fold_in(key, 0), (n,), jnp.uint32)
        lo = jax.random.bits(jax.random.fold_in(key, 1), (n,), jnp.uint32)
        if bits <= 32:
            return jnp.zeros(n, jnp.uint32), lo & ((1 << bits) - 1)
        return hi & ((1 << (bits - 32)) - 1), lo
    if isinstance(alphabet, (DNAAlphabet4, RNAAlphabet4)):
        two = jax.random.randint(key, (n, K), 0, 4, jnp.uint32)
        nib = jnp.left_shift(jnp.uint32(1), two)
        vals = nib
    elif isinstance(alphabet, AminoAcidAlphabet):
        tbl = jnp.asarray(PROTEOGENIC_AA.astype(np.uint32))
        vals = jnp.take(
            tbl, jax.random.randint(key, (n, K), 0, 20, jnp.int32), axis=0
        )
    else:
        raise NotImplementedError(
            "device-side sampling supports nucleotide and AA alphabets"
        )
    hi = jnp.zeros(n, jnp.uint32)
    lo = jnp.zeros(n, jnp.uint32)
    for i in range(K):
        # shift the register left by bps and OR the next encoding in
        hi = (hi << bps) | (lo >> (32 - bps))
        lo = (lo << bps) | vals[:, i]
    if bits > 32:
        hi = hi & jnp.uint32((1 << (bits - 32)) - 1)
    else:
        hi = jnp.zeros_like(hi)
        lo = lo & jnp.uint32((1 << bits) - 1)
    return hi, lo

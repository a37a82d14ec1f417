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
    "rand_kmers_mw",
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
    """One random K-mer under the reference's distribution rules (any K,
    like the reference's any-N sampling — /root/reference/ext/RandomExt.jl:37-50)."""
    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    rng = _rng(rng)
    vals = rand_kmers(alphabet, K, 1, rng)
    return Kmer.unsafe(alphabet, K, int(vals[0]))


def _rand_encodings(alphabet, K: int, n: int, rng) -> np.ndarray:
    """(n, K) per-symbol encodings under the reference's distribution
    rules (/root/reference/ext/RandomExt.jl:56-109)."""
    if isinstance(alphabet, (DNAAlphabet2, RNAAlphabet2)):
        # complete alphabet: raw random coding bits == iid uniform symbols
        return rng.integers(0, 4, (n, K), dtype=np.uint64)
    if isinstance(alphabet, (DNAAlphabet4, RNAAlphabet4)):
        # uniform unambiguous bases as one-hot nibbles
        return np.uint64(1) << rng.integers(0, 4, (n, K), dtype=np.uint64)
    if isinstance(alphabet, AminoAcidAlphabet):
        return rng.choice(PROTEOGENIC_AA, size=(n, K)).astype(np.uint64)
    # incomplete/generic alphabet: sample symbols uniformly
    syms = alphabet.symbols
    enc_tbl = np.array([alphabet.encode(s) for s in syms], dtype=np.uint64)
    return enc_tbl[rng.integers(0, len(syms), (n, K))]


def rand_kmers(alphabet, K: int, n: int, rng=None) -> np.ndarray:
    """``n`` random K-mer register values.

    For K * bits_per_symbol <= 64 the result is a uint64 array; for wider
    kmers (the reference samples any-N kmers) it is an object-dtype array
    of Python ints, directly usable with :meth:`Kmer.unsafe` or
    convertible to the multiword limb plane via :func:`rand_kmers_mw`.
    """
    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    rng = _rng(rng)
    bps = alphabet.bits_per_symbol
    bits = K * bps
    if K == 0:
        return np.zeros(n, np.uint64)
    if bits <= 64 and isinstance(alphabet, (DNAAlphabet2, RNAAlphabet2)):
        # fast path: raw random coding bits, masked
        raw = rng.integers(0, 2**64, n, dtype=np.uint64)
        return raw & np.uint64((1 << bits) - 1)
    enc = _rand_encodings(alphabet, K, n, rng)
    if bits <= 64:
        out = np.zeros(n, np.uint64)
        for i in range(K):
            out = (out << np.uint64(bps)) | enc[:, i]
        return out
    # multi-word: pack into Python big ints (object dtype)
    out = np.array([0] * n, dtype=object)
    for i in range(K):
        out = (out << int(bps)) | enc[:, i].astype(object)
    return out


def rand_kmers_mw(alphabet, K: int, n: int, rng=None) -> np.ndarray:
    """``n`` random K-mers as (n, M) uint32 limb arrays (big-endian,
    limb 0 most significant — the :mod:`kmers_tpu.ops.multiword` plane
    layout with zero padding in the top bits of limb 0)."""
    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    bps = alphabet.bits_per_symbol
    bits = K * bps
    M = max(-(-bits // 32), 1)
    vals = rand_kmers(alphabet, K, n, rng)
    out = np.zeros((n, M), np.uint32)
    mask = (1 << 32) - 1
    for j in range(M - 1, -1, -1):
        out[:, j] = np.array(
            [(int(v) >> (32 * (M - 1 - j))) & mask for v in vals], np.uint32
        )
    return out


def rand_kmers_device(key, alphabet, K: int, n: int):
    """Device-side batch of random K-mer registers, using ``jax.random``
    — for generating test/benchmark workloads directly in HBM without a
    host round-trip.

    Returns a (hi, lo) uint32 pair for K*bps <= 64, and an (n, M) uint32
    limb array (big-endian, the :mod:`kmers_tpu.ops.multiword` layout)
    for wider kmers.  Same distribution rules as :func:`rand_kmers` for
    the supported alphabets (2-bit raw bits; 4-bit one-hot; amino acids
    proteogenic).
    """
    import jax
    import jax.numpy as jnp

    if not isinstance(alphabet, Alphabet):
        alphabet = alphabet()
    bps = alphabet.bits_per_symbol
    bits = K * bps
    M = max(-(-bits // 32), 1)
    pad = 32 * M - bits  # zero padding in the top bits of limb 0
    if isinstance(alphabet, (DNAAlphabet2, RNAAlphabet2)):
        # complete alphabet: raw random coding bits per limb
        limbs = [
            jax.random.bits(jax.random.fold_in(key, j), (n,), jnp.uint32)
            for j in range(M)
        ]
        if pad:
            limbs[0] = limbs[0] & jnp.uint32((1 << (32 - pad)) - 1)
        if bits <= 32:
            return jnp.zeros(n, jnp.uint32), limbs[0]
        if bits <= 64:
            return limbs[0], limbs[1]
        return jnp.stack(limbs, axis=1)
    if isinstance(alphabet, (DNAAlphabet4, RNAAlphabet4)):
        two = jax.random.randint(key, (n, K), 0, 4, jnp.uint32)
        vals = jnp.left_shift(jnp.uint32(1), two)
    elif isinstance(alphabet, AminoAcidAlphabet):
        tbl = jnp.asarray(PROTEOGENIC_AA.astype(np.uint32))
        vals = jnp.take(
            tbl, jax.random.randint(key, (n, K), 0, 20, jnp.int32), axis=0
        )
    else:
        raise NotImplementedError(
            "device-side sampling supports nucleotide and AA alphabets"
        )
    # shift the M-limb register left by bps per symbol, carry across limbs
    limbs = [jnp.zeros(n, jnp.uint32) for _ in range(M)]
    for i in range(K):
        for j in range(M - 1):
            limbs[j] = (limbs[j] << bps) | (limbs[j + 1] >> (32 - bps))
        limbs[M - 1] = (limbs[M - 1] << bps) | vals[:, i]
    if pad:
        limbs[0] = limbs[0] & jnp.uint32((1 << (32 - pad)) - 1)
    if bits <= 32:
        return jnp.zeros(n, jnp.uint32), limbs[0]
    if bits <= 64:
        return limbs[0], limbs[1]
    return jnp.stack(limbs, axis=1)

"""Batched FxHash over U64 kmer registers.

Bit-exact with the scalar :func:`kmers_tpu.kmer.fx_hash`
(/root/reference/src/kmer.jl:255-261): per 64-bit register word,
``h = (rotl(h, 5) ^ word) * 0x517cc1b727220a95``, evaluated entirely in
uint32 lanes (see :mod:`kmers_tpu.ops.u64`).
"""

from __future__ import annotations

import jax

from . import u64
from ..kmer import FX_CONSTANT

__all__ = ["fx_hash_u64", "fx_hash_words"]


def fx_hash_words(words, h=None):
    """FxHash over a sequence of U64 words (multi-word kmers).

    ``words`` is an iterable of U64 pairs, head word first.
    """
    words = list(words)
    if not words:
        raise ValueError("need at least one word")
    shape = words[0][0].shape
    if h is None:
        h = u64.from_scalar(0, shape)
    C = u64.from_scalar(FX_CONSTANT, shape)
    for w in words:
        h = u64.mul(u64.xor(u64.rotl(h, 5), w), C)
    return h


@jax.jit
def fx_hash_u64(hi, lo):
    """FxHash of single-word (K*bps <= 64) kmer registers with seed 0:
    ``(0 rotl 5) ^ w == w``, so simply ``w * FX_CONSTANT``."""
    C = u64.from_scalar(FX_CONSTANT, hi.shape)
    return u64.mul((hi, lo), C)

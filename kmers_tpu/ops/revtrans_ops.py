"""Batched reverse translation: amino-acid codes -> CodonSet bitmasks.

The vectorized counterpart of :class:`kmers_tpu.revtrans.ReverseGeneticCode`
(/root/reference/src/revtrans.jl:157-199): a 27-entry table of uint64
codon-set masks, gathered per amino acid as (hi, lo) uint32 pairs.
Useful for motif-search back-translation over large protein batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..revtrans import ReverseGeneticCode, rev_standard_genetic_code

__all__ = ["reverse_translate_codes", "codon_set_table"]

_U32 = jnp.uint32


@functools.lru_cache(maxsize=None)
def codon_set_table(code: ReverseGeneticCode = rev_standard_genetic_code):
    """(hi, lo) uint32[27] tables of the code's CodonSet masks.

    Cached per code (codes are immutable), so batch loops pay the table
    construction and host->device upload once.
    """
    masks = np.array([s.x for s in code.sets], dtype=np.uint64)
    return (
        jnp.asarray((masks >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((masks & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


@jax.jit
def _gather_sets(aa_codes, tbl_hi, tbl_lo):
    idx = jnp.asarray(aa_codes, jnp.int32)
    return jnp.take(tbl_hi, idx, axis=0), jnp.take(tbl_lo, idx, axis=0)


def reverse_translate_codes(
    aa_codes, code: ReverseGeneticCode = rev_standard_genetic_code
):
    """Amino-acid code array -> (hi, lo) uint32 CodonSet masks.

    Gaps (code 27) cannot be reverse-translated and raise, matching the
    scalar path.
    """
    arr = np.asarray(aa_codes)
    if ((arr.astype(np.int64) < 0) | (arr.astype(np.int64) > 26)).any():
        raise ValueError("Cannot reverse translate element: gap/out-of-range")
    tbl_hi, tbl_lo = codon_set_table(code)
    return _gather_sets(arr, tbl_hi, tbl_lo)

"""Hand-written Pallas TPU kernels for the hot ops.

The jnp implementations in ``kmers_tpu.ops`` are the semantic reference;
these kernels are drop-in faster paths, validated against them in
tests/test_pallas.py.
"""

from .window_kernel import (
    canonical_windows_pallas,
    canonical_windows_masked_pallas,
    linearize_offset_major,
    HAVE_PALLAS,
)
from .general_kernel import windows_pallas_general
from .merge_kernel import bitonic_merge_tail_pallas
from .multiword_kernel import canonical_windows_mw_pallas
from .rle_kernel import rle_unit_pallas

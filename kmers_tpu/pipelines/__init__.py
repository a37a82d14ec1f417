"""End-to-end workloads built from the ops plane."""

from .canonical_count import (
    CountConfig,
    canonical_count,
    canonical_count_bytes,
    canonical_count_records,
    composition_vector,
    counts_lookup,
    counts_to_dict,
    join_records_with_n,
)
from .minhash import (
    StreamingSketcher,
    jaccard,
    minhash_sketch,
    sketch_fastx_stream,
)
from .streaming import StreamingCounter, count_fastx_stream
from .extract import extract_kmers, spaced_kmers, minimizer_select, syncmer_select
from .tables import (
    merge_counts,
    intersect_counts,
    subtract_counts,
    multiplicity_spectrum,
    merge_counts_device,
    jaccard_exact,
    containment,
)

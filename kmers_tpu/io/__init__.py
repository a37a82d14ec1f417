"""Host-side ingestion: FASTA/FASTQ parsing (native C++ with fallback)."""

from .fasta import (
    read_fastx,
    read_fastx_bytes,
    stream_fastx,
    native_available,
)

"""Count canonical k-mers of a FASTA/FASTQ file WITHOUT loading it.

Demonstrates the streaming ingestion path: `stream_fastx` yields record
batches (records never split across batches), `StreamingCounter` folds
them into the device-resident level-stack accumulator, and the final
table is identical to counting the whole file at once.

    python examples/stream_count.py reads.fa[.gz] [K]
"""

import sys

from kmers_tpu.io import stream_fastx
from kmers_tpu.pipelines import CountConfig, StreamingCounter


def main():
    path = sys.argv[1]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 31

    sc = StreamingCounter(CountConfig(K=K))
    for batch, (seq, offsets) in enumerate(
        stream_fastx(path, batch_bytes=1 << 26)
    ):
        sc.update(seq, offsets)
        print(
            f"batch {batch}: {offsets.size - 1} records, "
            f"{sc.bases_seen:,} bases so far",
            file=sys.stderr,
        )

    kmers, counts = sc.finalize()
    print(f"distinct canonical {K}-mers: {kmers.size:,}")
    print(f"total counted windows:      {int(counts.sum()):,}")
    top = counts.argsort()[::-1][:5]
    from kmers_tpu import DNAAlphabet2, Kmer

    for i in top:
        k = Kmer.unsafe(DNAAlphabet2(), K, int(kmers[i]))
        print(f"  {k}  x{counts[i]}")


if __name__ == "__main__":
    main()

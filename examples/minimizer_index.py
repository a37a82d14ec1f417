"""Example: build a minimizer index (position -> kmer) of a chromosome.

    python examples/minimizer_index.py genome.fa -k 15 -w 10

(W, K)-minimizer sampling — the seed scheme of minimap2-style mappers —
using the batched sliding-min kernel; the sampled positions cover the
sequence with ~2/(W+1) density.
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("fasta")
    p.add_argument("-k", type=int, default=15)
    p.add_argument("-w", type=int, default=10)
    args = p.parse_args()

    import re

    from kmers_tpu.io import read_fastx
    from kmers_tpu.pipelines import minimizer_select

    seq, off = read_fastx(args.fasta)
    index = {}
    span = args.k + args.w - 1
    for i in range(off.size - 1):
        rec = bytes(seq[off[i] : off[i + 1]]).upper()
        # minimizer seeds come from clean segments: split at non-ACGT runs
        # (the standard mapper convention), keeping global offsets
        for m in re.finditer(rb"[ACGT]+", rec):
            segment = m.group(0)
            if len(segment) < span:
                continue
            vals, pos = minimizer_select(segment, K=args.k, W=args.w)
            for v, pp in zip(vals, pos):
                index.setdefault(int(v), []).append((i, m.start() + int(pp)))
    n_pos = sum(len(v) for v in index.values())
    density = n_pos / max(int(seq.size), 1)
    print(
        f"{len(index)} distinct minimizers, {n_pos} positions, "
        f"density {density:.3f} (expected ~{2 / (args.w + 1):.3f})"
    )


if __name__ == "__main__":
    main()

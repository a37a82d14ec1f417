"""Example: MinHash distance matrix over a set of FASTA files.

    python examples/sketch_compare.py a.fa b.fa c.fa

Mash-style: sketch each input (s smallest distinct canonical-kmer
FxHashes), estimate pairwise Jaccard, print the matrix — the reference's
minhash workflow (/root/reference/docs/src/minhash.md) at batch scale.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("fastas", nargs="+")
    p.add_argument("-k", type=int, default=16)
    p.add_argument("-s", type=int, default=1000)
    args = p.parse_args()

    from kmers_tpu.io import read_fastx
    from kmers_tpu.pipelines import jaccard, minhash_sketch
    from kmers_tpu.pipelines.canonical_count import join_records_with_n

    sketches = []
    for path in args.fastas:
        seq, off = read_fastx(path)
        sketches.append(
            minhash_sketch(join_records_with_n(seq, off).tobytes(), K=args.k, s=args.s)
        )

    print("\t" + "\t".join(args.fastas))
    for i, a in enumerate(args.fastas):
        row = [f"{jaccard(sketches[i], sketches[j]):.3f}" for j in range(len(sketches))]
        print(a + "\t" + "\t".join(row))


if __name__ == "__main__":
    main()

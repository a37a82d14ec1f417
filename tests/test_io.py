"""FASTA/FASTQ ingestion: native scanner vs Python fallback vs fixtures."""

import numpy as np
import pytest

from kmers_tpu.io import native_available, read_fastx_bytes

FASTA = b""">chr1 description here
ACGTACGT
ACGT
>chr2
NNNACGT
>empty

>chr3
acgtn
"""

FASTQ = b"""@read1
ACGTACGT
+
IIIIIIII
@read2 desc
ACGT
+read2
!!!!
"""


class TestFasta:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_basic(self, use_native):
        if use_native and not native_available():
            pytest.skip("native scanner unavailable")
        seq, off = read_fastx_bytes(FASTA, use_native=use_native)
        records = [
            bytes(seq[off[i] : off[i + 1]]) for i in range(len(off) - 1)
        ]
        assert records == [b"ACGTACGTACGT", b"NNNACGT", b"", b"acgtn"]

    @pytest.mark.parametrize("use_native", [False, True])
    def test_fastq(self, use_native):
        if use_native and not native_available():
            pytest.skip("native scanner unavailable")
        seq, off = read_fastx_bytes(FASTQ, use_native=use_native)
        records = [
            bytes(seq[off[i] : off[i + 1]]) for i in range(len(off) - 1)
        ]
        assert records == [b"ACGTACGT", b"ACGT"]

    def test_native_matches_python(self, rng):
        if not native_available():
            pytest.skip("native scanner unavailable")
        # random multi-record FASTA with CRLF and wrapped lines
        recs = []
        blob = b""
        for i in range(20):
            n = int(rng.integers(0, 500))
            s = bytes(
                np.frombuffer(b"ACGTN", np.uint8)[rng.integers(0, 5, n)]
            )
            recs.append(s)
            wrapped = b"\r\n".join(
                s[j : j + 60] for j in range(0, max(n, 1), 60)
            )
            blob += b">rec%d\r\n" % i + wrapped + b"\r\n"
        sn, on_ = read_fastx_bytes(blob, use_native=True)
        sp, op = read_fastx_bytes(blob, use_native=False)
        assert np.array_equal(sn, sp) and np.array_equal(on_, op)
        got = [bytes(sn[on_[i] : on_[i + 1]]) for i in range(len(on_) - 1)]
        assert got == recs

    def test_malformed(self):
        with pytest.raises(ValueError):
            read_fastx_bytes(b"not a fasta")

    def test_empty(self):
        seq, off = read_fastx_bytes(b"")
        assert seq.size == 0 and list(off) == [0]


class TestNativeMerge:
    def test_vs_numpy(self, rng):
        from kmers_tpu.io.fasta import merge_count_tables_native

        k1 = np.unique(rng.integers(0, 1000, 200, dtype=np.uint64))
        c1 = rng.integers(1, 9, k1.size).astype(np.int64)
        k2 = np.unique(rng.integers(0, 1000, 150, dtype=np.uint64))
        c2 = rng.integers(1, 9, k2.size).astype(np.int64)
        km, cm = merge_count_tables_native(k1, c1, k2, c2)
        import collections

        want = collections.Counter()
        for k, c in zip(k1.tolist(), c1.tolist()):
            want[k] += c
        for k, c in zip(k2.tolist(), c2.tolist()):
            want[k] += c
        assert dict(zip(km.tolist(), cm.tolist())) == dict(want)
        assert np.array_equal(np.sort(km), km)

    def test_empty(self):
        from kmers_tpu.io.fasta import merge_count_tables_native

        k, c = merge_count_tables_native(
            np.zeros(0, np.uint64), np.zeros(0, np.int64),
            np.array([5], np.uint64), np.array([2], np.int64),
        )
        assert k.tolist() == [5] and c.tolist() == [2]


def test_read_fastx_gzip(tmp_path):
    import gzip

    from kmers_tpu.io import read_fastx

    text = ">r1\nACGTACGT\nACGT\n>r2\nTTTT\n"
    plain = tmp_path / "a.fa"
    plain.write_text(text)
    gz = tmp_path / "a.fa.gz"
    gz.write_bytes(gzip.compress(text.encode()))
    s1, o1 = read_fastx(plain)
    s2, o2 = read_fastx(gz)
    assert np.array_equal(s1, s2) and np.array_equal(o1, o2)
    assert bytes(s2).decode() == "ACGTACGTACGTTTTT"


class TestStreamFastx:
    @staticmethod
    def _write_fasta(path, rng, n_rec=40, lmin=50, lmax=900):
        recs = []
        with open(path, "wb") as f:
            for i in range(n_rec):
                s = "".join(
                    "ACGTN"[j] for j in rng.integers(0, 5, rng.integers(lmin, lmax))
                )
                recs.append(s)
                f.write(f">r{i} desc\n".encode())
                for k in range(0, len(s), 60):
                    f.write(s[k : k + 60].encode() + b"\n")
        return recs

    def test_fasta_batches_match_whole_file(self, tmp_path, rng):
        from kmers_tpu.io import read_fastx, stream_fastx

        p = tmp_path / "reads.fa"
        self._write_fasta(p, rng)
        seq, off = read_fastx(p)
        got_seqs = []
        for bseq, boff in stream_fastx(p, batch_bytes=777):
            for i in range(boff.size - 1):
                got_seqs.append(bytes(bseq[boff[i] : boff[i + 1]]))
        want = [
            bytes(seq[off[i] : off[i + 1]]) for i in range(off.size - 1)
        ]
        assert got_seqs == want

    def test_fastq_batches_match_whole_file(self, tmp_path, rng):
        from kmers_tpu.io import read_fastx, stream_fastx

        p = tmp_path / "reads.fq"
        with open(p, "wb") as f:
            for i in range(60):
                s = "".join("ACGT"[j] for j in rng.integers(0, 4, 80))
                f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode())
        seq, off = read_fastx(p)
        got = []
        for bseq, boff in stream_fastx(p, batch_bytes=1000):
            for i in range(boff.size - 1):
                got.append(bytes(bseq[boff[i] : boff[i + 1]]))
        want = [bytes(seq[off[i] : off[i + 1]]) for i in range(off.size - 1)]
        assert got == want

    def test_gzip_stream(self, tmp_path, rng):
        import gzip

        from kmers_tpu.io import read_fastx, stream_fastx

        p = tmp_path / "reads.fa"
        self._write_fasta(p, rng, n_rec=10)
        gz = tmp_path / "reads.fa.gz"
        gz.write_bytes(gzip.compress(p.read_bytes()))
        seq, off = read_fastx(p)
        parts = list(stream_fastx(gz, batch_bytes=512))
        total = sum(b.size for b, _ in parts)
        assert total == seq.size

    def test_streaming_counter_matches_batch(self, tmp_path, rng):
        from kmers_tpu.pipelines import (
            CountConfig,
            canonical_count_records,
            count_fastx_stream,
        )
        from kmers_tpu.io import read_fastx

        p = tmp_path / "reads.fa"
        self._write_fasta(p, rng, n_rec=30, lmin=40, lmax=400)
        cfg = CountConfig(K=15, chunk_size=2048)
        k1, c1 = count_fastx_stream(p, cfg, batch_bytes=999)
        seq, off = read_fastx(p)
        k2, c2 = canonical_count_records(seq, off, cfg)
        assert np.array_equal(k1, k2) and np.array_equal(c1, c2)

    def test_streaming_counter_invalid_raises(self):
        from kmers_tpu import EncodeError
        from kmers_tpu.pipelines import CountConfig, StreamingCounter

        sc = StreamingCounter(CountConfig(K=5))
        sc.update(b"ACGTACGTAC!GTACGT")
        with pytest.raises(EncodeError):
            sc.finalize()

"""Incremental canonical counting over unbounded inputs.

``canonical_count_bytes`` streams a single in-memory buffer;
:class:`StreamingCounter` exposes the same device-resident level-stack
accumulator as an *incremental* API: push record batches as they are
read, finalize once.  Combined with :func:`kmers_tpu.io.stream_fastx`
this counts files larger than host memory end-to-end — the
checkpoint/streaming obligation of SURVEY.md §5 ("real k-mer counting
exceeds HBM") without ever materializing the input.

Semantics: each ``update()`` call is a record batch — windows never span
two calls (callers pass whole records; batch boundaries behave like
record boundaries).  Within a call, records are joined with 'N'
separators (the ambiguity skip class), so results are bit-identical to
counting the concatenated input with ``canonical_count_records``.
"""

from __future__ import annotations

import numpy as np

from .canonical_count import (
    CountConfig,
    _as_byte_array,
    _chunk_count,
    _chunk_count_u32,
    _on_tpu,
    _pad_to_u32_view,
    join_records_with_n,
)
from ..ops.count import _next_pow2, compact_counts, merge_compact_tables

__all__ = ["StreamingCounter", "count_fastx_stream"]


class StreamingCounter:
    """Device-resident canonical K-mer counter with incremental updates.

    >>> sc = StreamingCounter(CountConfig(K=31))
    >>> for seq, off in stream_fastx("reads.fq.gz"):
    ...     sc.update(seq, off)
    >>> kmers, counts = sc.finalize()

    Peak device memory is O(distinct * log(batches)) table rows plus one
    chunk of windows — independent of total input length.  K <= 31
    (single-register tables).
    """

    def __init__(self, config: CountConfig = CountConfig()):
        if config.K > 31:
            raise ValueError(
                "StreamingCounter supports K <= 31 (use "
                "canonical_count_bytes for multi-limb K)"
            )
        if not config.skip_ambiguous:
            raise ValueError("streaming counting requires skip_ambiguous=True")
        self.config = config
        self._stack: list[tuple[int, tuple]] = []  # (level, (uh, ul, cnt))
        self._use_pallas = (
            _on_tpu() if config.use_pallas is None else config.use_pallas
        )
        self._n_invalid = 0
        self._bases = 0
        self._done = False

    def _push(self, tbl):
        level = 0
        while self._stack and self._stack[-1][0] == level:
            _, other = self._stack.pop()
            mh, ml, mc, mnu = merge_compact_tables(*other, *tbl)
            cap = _next_pow2(max(int(mnu), 1))
            tbl = (mh[:cap], ml[:cap], mc[:cap])
            level += 1
        self._stack.append((level, tbl))

    def update(self, seq_bytes, offsets=None):
        """Count one record batch.  ``offsets`` (optional int64 CSR
        record starts, as returned by the fastx readers) joins records
        with 'N' so windows never span records; without it the buffer is
        treated as a single record."""
        import jax.numpy as jnp

        if self._done:
            raise RuntimeError("finalize() already called")
        arr = _as_byte_array(seq_bytes)
        if offsets is not None:
            arr = join_records_with_n(arr, offsets)
        K = self.config.K
        L = arr.shape[0]
        if L < K:
            return
        self._bases += L
        step = max(self.config.chunk_size - (K - 1), K)
        for start in range(0, max(L - K + 1, 1), step):
            chunk = arr[start : start + self.config.chunk_size]
            # quantize the dispatch shape (pow2 buckets, 'N' padding) so
            # variable-length reader batches reuse a bounded set of
            # compiled executables instead of recompiling per length
            target = max(16384, _next_pow2(chunk.shape[0]))
            if chunk.shape[0] < target:
                chunk = np.concatenate(
                    [chunk, np.full(target - chunk.shape[0], ord("N"), np.uint8)]
                )
            if self._use_pallas:
                v, _ = _pad_to_u32_view(chunk)
                uh, ul, cnt, nu, n_inv, _n_amb = _chunk_count_u32(
                    jnp.asarray(v), K
                )
            else:
                uh, ul, cnt, nu, n_inv, _n_amb = _chunk_count(
                    jnp.asarray(chunk), K, False
                )
            # per-chunk scalar fetches: the streaming API is sync per
            # batch anyway (the reader is the bottleneck)
            self._n_invalid += int(n_inv)
            uh, ul, cnt = compact_counts(uh, ul, cnt)
            cap = _next_pow2(max(int(nu), 1))
            self._push((uh[:cap], ul[:cap], cnt[:cap]))

    @property
    def bases_seen(self) -> int:
        return self._bases

    def finalize(self):
        """Fold the accumulator and return sorted ``(kmers, counts)``.

        Raises :class:`EncodeError` if any invalid (non-IUPAC) byte was
        seen in any batch."""
        from ..alphabets import DNAAlphabet2, EncodeError

        self._done = True
        if self._n_invalid:
            raise EncodeError(DNAAlphabet2(), "<stream input>")
        if not self._stack:
            return np.zeros(0, np.uint64), np.zeros(0, np.int64)
        tbl = self._stack.pop()[1]
        while self._stack:
            mh, ml, mc, mnu = merge_compact_tables(*self._stack.pop()[1], *tbl)
            cap = _next_pow2(max(int(mnu), 1))
            tbl = (mh[:cap], ml[:cap], mc[:cap])
        uh, ul, cnt = (np.asarray(x) for x in tbl)
        kmers = (uh.astype(np.uint64) << np.uint64(32)) | ul.astype(np.uint64)
        keep = cnt > 0
        return kmers[keep], cnt[keep].astype(np.int64)


def count_fastx_stream(
    path, config: CountConfig = CountConfig(), batch_bytes: int = 1 << 26
):
    """Count canonical K-mers of a FASTA/FASTQ file without loading it:
    stream record batches through a :class:`StreamingCounter`.

    Bit-identical to ``canonical_count_records(*read_fastx(path))`` —
    tested — but with O(batch) host memory.
    """
    from ..io import stream_fastx

    sc = StreamingCounter(config)
    for seq, off in stream_fastx(path, batch_bytes=batch_bytes):
        sc.update(seq, off)
    return sc.finalize()

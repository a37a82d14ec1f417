"""FASTA/FASTQ ingestion: native C++ scanner with a pure-Python fallback.

The reference delegates file IO to FASTX.jl and feeds kmer iterators with
``StringView``s (/root/reference/ext/StringViewsExt.jl,
docs/src/minhash.md); this framework owns ingestion because the TPU
encode kernels want large contiguous byte buffers, not line-by-line
records.  Records come back CSR-style: one concatenated sequence byte
buffer plus record-start offsets — windows must not span records, which
downstream masking enforces via these offsets.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "read_fastx",
    "read_fastx_bytes",
    "stream_fastx",
    "native_available",
]

_NATIVE_DIR = Path(__file__).parent / "native"
_SO_PATH = _NATIVE_DIR / "libfastx.so"
_lib = None


def _build_native() -> bool:
    src = _NATIVE_DIR / "fastx.cpp"
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(_SO_PATH), str(src),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "fastx.cpp"
    stale = (
        _SO_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _SO_PATH.stat().st_mtime
    )
    if (not _SO_PATH.exists() or stale) and not _build_native():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.fastx_count_records.restype = ctypes.c_int64
        lib.fastx_count_records.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.fastx_scan.restype = ctypes.c_int
        lib.fastx_scan.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.merge_count_tables.restype = ctypes.c_int64
        lib.merge_count_tables.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load_native())


def _scan_native(buf: np.ndarray):
    lib = _load_native()
    n_rec = lib.fastx_count_records(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size
    )
    if n_rec < 0:
        raise ValueError("malformed FASTA/FASTQ input")
    seq = np.empty(buf.size, dtype=np.uint8)
    offsets = np.empty(n_rec + 1, dtype=np.int64)
    out_n = ctypes.c_int64()
    out_len = ctypes.c_int64()
    rc = lib.fastx_scan(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        seq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(out_n),
        ctypes.byref(out_len),
    )
    if rc != 0:
        raise ValueError("malformed FASTA/FASTQ input")
    return seq[: out_len.value].copy(), offsets[: out_n.value + 1]


def _scan_python(buf: np.ndarray):
    data = buf.tobytes()
    if not data:
        return np.zeros(0, np.uint8), np.zeros(1, np.int64)
    seqs: list[bytes] = []
    offsets = [0]
    total = 0
    if data[0:1] == b">":
        for rec in data.split(b">")[1:]:
            lines = rec.split(b"\n")
            s = b"".join(l.replace(b"\r", b"") for l in lines[1:])
            seqs.append(s)
            total += len(s)
            offsets.append(total)
    elif data[0:1] == b"@":
        lines = data.split(b"\n")
        i = 0
        while i < len(lines) and lines[i]:
            if not lines[i].startswith(b"@"):
                raise ValueError("malformed FASTQ input")
            i += 1
            seq_parts = []
            while i < len(lines) and not lines[i].startswith(b"+"):
                seq_parts.append(lines[i].replace(b"\r", b""))
                i += 1
            s = b"".join(seq_parts)
            i += 1  # '+' line
            q = 0
            while i < len(lines) and q < len(s):
                q += len(lines[i].replace(b"\r", b""))
                i += 1
            seqs.append(s)
            total += len(s)
            offsets.append(total)
            while i < len(lines) and not lines[i]:
                i += 1
    else:
        raise ValueError("malformed FASTA/FASTQ input")
    return (
        np.frombuffer(b"".join(seqs), dtype=np.uint8).copy(),
        np.asarray(offsets, dtype=np.int64),
    )


def read_fastx_bytes(data, use_native: bool | None = None):
    """Parse FASTA/FASTQ bytes -> (seq_bytes uint8, record_offsets int64).

    ``seq_bytes`` is every record's sequence concatenated (newlines and
    headers removed); ``record_offsets[i]:record_offsets[i+1]`` delimits
    record *i*.
    """
    if isinstance(data, (bytes, bytearray, memoryview)):
        buf = np.frombuffer(bytes(data), dtype=np.uint8)
    else:
        buf = np.asarray(data, dtype=np.uint8)
    use = native_available() if use_native is None else use_native
    if use:
        return _scan_native(np.ascontiguousarray(buf))
    return _scan_python(buf)


def read_fastx(path, use_native: bool | None = None):
    """Read and parse a FASTA/FASTQ file (see :func:`read_fastx_bytes`).

    Gzip-compressed files (the common on-disk form) are detected by the
    magic bytes and inflated transparently (CPython's gzip is zlib's C
    inflate, so no extra native path is needed)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(data)
    return read_fastx_bytes(data, use_native=use_native)


def merge_count_tables_native(k1, c1, k2, c2):
    """Merge two sorted (kmer uint64, count int64) tables, summing
    duplicates — native two-pointer merge with numpy fallback."""
    k1 = np.ascontiguousarray(k1, dtype=np.uint64)
    c1 = np.ascontiguousarray(c1, dtype=np.int64)
    k2 = np.ascontiguousarray(k2, dtype=np.uint64)
    c2 = np.ascontiguousarray(c2, dtype=np.int64)
    lib = _load_native()
    if lib:
        ko = np.empty(k1.size + k2.size, dtype=np.uint64)
        co = np.empty(k1.size + k2.size, dtype=np.int64)
        n = lib.merge_count_tables(
            k1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            c1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            k1.size,
            k2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            c2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            k2.size,
            ko.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            co.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return ko[:n].copy(), co[:n].copy()
    kmers = np.concatenate([k1, k2])
    counts = np.concatenate([c1, c2])
    uniq, inv = np.unique(kmers, return_inverse=True)
    summed = np.zeros(uniq.size, np.int64)
    np.add.at(summed, inv, counts)
    return uniq, summed


def stream_fastx(path, batch_bytes: int = 1 << 26):
    """Stream a FASTA/FASTQ file as (seq_bytes, record_offsets) batches.

    Reads ``batch_bytes``-sized blocks and yields each as a parsed CSR
    record batch, cutting only at record boundaries — records are never
    split across batches, so feeding the batches to
    :class:`kmers_tpu.pipelines.StreamingCounter` is bit-identical to
    parsing the whole file at once.  Host memory stays O(batch + largest
    record).  Gzip input streams through zlib's inflate.

    FASTQ streaming assumes the standard 4-line record form (batch cuts
    align to multiples of four lines); multi-line FASTQ should use
    :func:`read_fastx`.
    """
    with open(path, "rb") as raw:
        head = raw.read(2)
        raw.seek(0)
        if head == b"\x1f\x8b":
            import gzip

            f = gzip.open(raw)
            yield from _stream_fastx_file(f, batch_bytes)
        else:
            yield from _stream_fastx_file(raw, batch_bytes)


def _fastx_cut(buf: bytes, is_fastq: bool) -> int:
    """Byte index where the trailing (possibly partial) record starts;
    everything before it is complete records."""
    if is_fastq:
        # standard 4-line records: cut after the last full group of 4
        # lines.  With rem = n_lines % 4, the cut sits after newline
        # number n_lines - rem, which is rem+1 rfind steps from the end
        # (one extra step absorbs any trailing partial line) — O(tail)
        # instead of one .index call per newline in the batch.
        n_lines = buf.count(b"\n")
        if n_lines // 4 == 0:
            return 0
        pos = len(buf)
        for _ in range(n_lines % 4 + 1):
            pos = buf.rfind(b"\n", 0, pos)
        return pos + 1
    cut = buf.rfind(b"\n>")
    return cut + 1 if cut != -1 else 0


def _stream_fastx_file(f, batch_bytes: int):
    carry = b""
    is_fastq = None
    while True:
        block = f.read(batch_bytes)
        if not block:
            break
        buf = carry + block
        if is_fastq is None:
            if buf[:1] == b"@":
                is_fastq = True
            elif buf[:1] == b">":
                is_fastq = False
            else:
                raise ValueError("malformed FASTA/FASTQ input")
        cut = _fastx_cut(buf, is_fastq)
        emit, carry = buf[:cut], buf[cut:]
        if emit:
            yield read_fastx_bytes(emit)
    if carry:
        yield read_fastx_bytes(carry)

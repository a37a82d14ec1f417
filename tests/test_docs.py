"""Execute every ```python snippet in docs/*.md.

The reference runs all docstring examples in CI (Documenter doctests,
/root/reference/docs/make.jl:3-27, checkdocs = :exports); this is the
equivalent guard — a stale snippet fails the suite.

Blocks on one page share a namespace (later blocks may use earlier
imports); a small preamble provides the free variables the prose
establishes around the snippets (a DNA buffer ``seq``, packed ``codes``,
window parameters).
"""

import pathlib
import re

import numpy as np
import pytest

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def _pages():
    for p in sorted(DOCS.glob("*.md")):
        blocks = re.findall(r"```python\n(.*?)```", p.read_text(), re.S)
        if blocks:
            yield pytest.param(p.name, blocks, id=p.name)


def _preamble(tmp_path):
    import jax.numpy as jnp

    import kmers_tpu as kt
    from kmers_tpu.ops.encode import classify_2bit

    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 600))
    codes = classify_2bit(jnp.asarray(np.frombuffer(seq.encode(), np.uint8)))[0]
    ns = {
        "np": np,
        "seq": seq,
        "seq_a": seq,
        "seq_b": seq[1:] + "A",
        "codes": codes,
        "K": 15,
        "W": 10,
        "seq4bit": kt.Seq(kt.DNAAlphabet4(), "TGCA"),
        "rank": 0,
        "n": 1,
        "fx_hash": kt.fx_hash,
        "CanonicalDNAMers": kt.CanonicalDNAMers,
        "AAKmer": kt.AAKmer,
        "DNAAlphabet2": kt.DNAAlphabet2,
        "DNAAlphabet4": kt.DNAAlphabet4,
        "AminoAcidAlphabet": kt.AminoAcidAlphabet,
        "ncbi_trans_table": kt.ncbi_trans_table,
        "tmp_path": tmp_path,
        "fastx_path": _write_fastx_gz(tmp_path, rng),
    }
    return ns


def _write_fastx_gz(tmp_path, rng):
    """The small gzip FASTQ file the streaming snippets read."""
    import gzip

    p = tmp_path / "reads.fq.gz"
    recs = []
    for i in range(6):
        s = "".join("ACGT"[j] for j in rng.integers(0, 4, 200))
        recs.append(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    p.write_bytes(gzip.compress("".join(recs).encode()))
    return str(p)


@pytest.mark.parametrize("page,blocks", list(_pages()))
def test_docs_snippets(page, blocks, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # snippets may write relative paths
    ns = _preamble(tmp_path)
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{page}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{page} block {i} failed: {e!r}\n{block}")

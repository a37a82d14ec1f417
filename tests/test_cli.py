"""CLI front-end smoke tests."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    rng = np.random.default_rng(1)
    p = tmp_path_factory.mktemp("cli") / "reads.fa"
    reads = [
        "".join("ACGT"[i] for i in rng.integers(0, 4, 120)) for _ in range(8)
    ]
    p.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    return p


def run_cli(*args):
    # in-process to inherit the CPU-forced test backend
    from kmers_tpu.__main__ import main

    main([str(a) for a in args])


def test_count(fasta, capsys):
    run_cli("count", fasta, "-k", "15", "--top", "2")
    out = capsys.readouterr()
    assert len(out.out.strip().splitlines()) == 2
    stats = json.loads(out.err.strip().splitlines()[-1])
    assert stats["total"] == 8 * (120 - 15 + 1)


def test_count_metrics_and_checked(fasta, capsys):
    run_cli("count", fasta, "-k", "15", "--top", "1", "--metrics", "--checked")
    out = capsys.readouterr()
    m = json.loads(out.err.strip().splitlines()[0])
    assert m["windows_out"] == 8 * (120 - 15 + 1)
    assert m["n_batches"] == 1
    from kmers_tpu.utils import checked_mode

    assert not checked_mode()  # flag restored after the run


def test_count_checkpoint(fasta, tmp_path, capsys):
    run_cli("count", fasta, "-k", "15", "-o", tmp_path / "tbl")
    out = json.loads(capsys.readouterr().out.strip())
    from kmers_tpu.utils import load_count_table

    kmers, counts, K = load_count_table(tmp_path / "tbl")
    assert K == 15 and counts.sum() == out["total"]


def test_sketch(fasta, capsys):
    run_cli("sketch", fasta, "-k", "11", "-s", "20")
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "#kmers_tpu sketch k=11 s=20"
    hashes = lines[1:]
    assert len(hashes) == 20
    assert all(len(l) == 16 for l in hashes)


def test_dist(fasta, tmp_path, capsys):
    run_cli("sketch", fasta, "-k", "11", "-s", "50")
    sk = capsys.readouterr().out
    p = tmp_path / "a.sketch"
    p.write_text(sk)
    # sketch file vs the FASTA it came from: identical sketches, j = 1
    run_cli("dist", p, fasta, "-k", "11", "-s", "50")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["jaccard"] == 1.0
    assert out["mash_distance"] == 0.0


def test_sketch_stream_matches_loaded(fasta, capsys):
    run_cli("sketch", fasta, "-k", "11", "-s", "20")
    loaded = capsys.readouterr().out
    run_cli("sketch", fasta, "-k", "11", "-s", "20", "--stream")
    streamed = capsys.readouterr().out
    assert streamed == loaded


def test_dist_k_mismatch_rejected(fasta, tmp_path, capsys):
    import pytest

    run_cli("sketch", fasta, "-k", "11", "-s", "50")
    p = tmp_path / "a.sketch"
    p.write_text(capsys.readouterr().out)
    with pytest.raises(SystemExit, match="k=11"):
        run_cli("dist", p, fasta, "-k", "13", "-s", "50")


def test_dist_dedupes_headerless(fasta, tmp_path, capsys):
    # headerless legacy file with duplicated lines: warns, dedupes, and
    # still reports j = 1 against the FASTA it came from
    run_cli("sketch", fasta, "-k", "11", "-s", "50")
    lines = capsys.readouterr().out.strip().splitlines()[1:]
    p = tmp_path / "a.sketch"
    p.write_text("\n".join(lines + lines) + "\n")
    run_cli("dist", p, fasta, "-k", "11", "-s", "50")
    cap = capsys.readouterr()
    assert "no sketch header" in cap.err
    assert json.loads(cap.out.strip())["jaccard"] == 1.0


def test_sixframe(fasta, capsys):
    run_cli("sixframe", fasta, "-k", "4")
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["total"] > 0


def test_merge_checkpoints(fasta, tmp_path, capsys):
    from kmers_tpu.utils import load_count_table

    d1, d2, dm = tmp_path / "t1", tmp_path / "t2", tmp_path / "merged"
    run_cli("count", fasta, "-k", "15", "-o", d1)
    run_cli("count", fasta, "-k", "15", "-o", d2)
    capsys.readouterr()
    run_cli("merge", d1, d2, "-o", dm)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    k1, c1, K = load_count_table(d1)
    km, cm, Km = load_count_table(dm)
    assert K == Km == 15
    assert np.array_equal(km, k1) and np.array_equal(cm, 2 * c1)
    assert out["total"] == int(2 * c1.sum())


def test_merge_k_mismatch(fasta, tmp_path, capsys):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    run_cli("count", fasta, "-k", "15", "-o", d1)
    run_cli("count", fasta, "-k", "17", "-o", d2)
    capsys.readouterr()
    with pytest.raises(SystemExit):
        run_cli("merge", d1, d2, "-o", tmp_path / "m")


def test_count_stream(fasta, capsys):
    run_cli("count", fasta, "-k", "15", "--stream", "--top", "2")
    out = capsys.readouterr()
    stats = json.loads(out.err.strip().splitlines()[-1])
    assert stats["total"] == 8 * (120 - 15 + 1)


def test_verify_checkpoint(fasta, tmp_path, capsys):
    run_cli("count", fasta, "-k", "15", "-o", tmp_path / "tbl")
    capsys.readouterr()
    run_cli("verify", tmp_path / "tbl")
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["ok"] and rep["inputs_checked"] == 1

    # mutate the input: verify must fail loudly
    with open(fasta, "ab") as f:
        f.write(b">extra\nACGT\n")
    with pytest.raises(SystemExit):
        run_cli("verify", tmp_path / "tbl")
    rep = json.loads(capsys.readouterr().out.strip())
    assert not rep["ok"] and rep["inputs_changed"]

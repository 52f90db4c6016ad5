"""Smoke + semantics tests for the utils subcommands."""

import os

from cli_helper import run_module

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run(args, **kw):
    return run_module("shrimp_tpu.tools.utils", args, cwd=ROOT, **kw)


def test_cs2ls_roundtrip(tmp_path):
    p = tmp_path / "cs.txt"
    p.write_text("T3210\n")
    r = run(["cs2ls", str(p)])
    # T -(3)-> A -(2)-> G -(1)-> T -(0)-> T
    assert r.stdout.strip() == "AGTT"


def test_colourise_matches_cs2ls(tmp_path):
    p = tmp_path / "ls.txt"
    p.write_text("AGTT\n")
    r = run(["colourise", str(p)])
    assert r.stdout.strip() == "T3210"


def test_revcmpl(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">c\nACGTN\n")
    r = run(["revcmpl", str(p)])
    assert r.stdout == ">c\nNACGT\n"


def test_fastq2fasta():
    r = run(["fastq2fasta", os.path.join(GOLDEN, "mini_reads.fq")])
    lines = r.stdout.splitlines()
    assert lines[0].startswith(">read000")
    assert len(lines) == 80


def test_getcontigs():
    r = run(["getcontigs", os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.stdout == "chrA\t30000\nchrB\t20000\n"


def test_subsequence():
    r = run(["subsequence", os.path.join(GOLDEN, "golden_genome.fa"),
             "chrA", "1", "10"])
    assert len(r.stdout.splitlines()[1]) == 10


def test_mergepairfiles(tmp_path):
    a = tmp_path / "a.fq"
    b = tmp_path / "b.fq"
    a.write_text("@r1:1\nAA\n+\nII\n")
    b.write_text("@r1:2\nCC\n+\nII\n")
    r = run(["mergepairfiles", "-Q", str(a), str(b)])
    assert r.stdout.splitlines()[0] == "@r1:1"
    assert r.stdout.splitlines()[4] == "@r1:2"


def test_tophits():
    r = run(["tophits", "1", os.path.join(GOLDEN, "legacy_mini.out")])
    lines = [l for l in r.stdout.splitlines() if l.startswith(">")]
    names = [l.split("\t")[0] for l in lines]
    assert len(names) == len(set(names))


def test_findseq_overlapping(tmp_path):
    """findseq.py semantics: 1-based, overlapping occurrences."""
    p = tmp_path / "c.fa"
    p.write_text(">c\nGGaaaaGG\n")
    r = run(["findseq", str(p), "aa"])
    assert r.stdout == ("Sequence Found at Positions:\n"
                        "    3\n    4\n    5\n")
    r = run(["findseq", str(p), "TTT"])
    assert r.stdout == "Sequence Not Found.\n"


def test_findseq_multicontig_error(tmp_path):
    p = tmp_path / "c.fa"
    p.write_text(">a\nAC\n>b\nGT\n")
    r = run(["findseq", str(p), "AC"])
    assert r.returncode == 1
    assert "one contig per file" in r.stderr


def test_clippedmappings(monkeypatch):
    """get_clipped_mappings.py: H-clipped SAM records -> FASTQ from the
    15th (seq tag) and 14th (qual tag) columns."""
    import io as _io
    import sys as _sys
    sam = (
        "@HD\tVN:1.0\n"
        "r1\t0\tc\t1\t255\t5M\t*\t0\t0\tACGTA\tIIIII"
        "\tX0:i:1\tX1:i:2\tOQ:Z:JJJJJ\tOS:Z:ACGTA\n"
        "r2\t0\tc\t1\t255\t2H3M\t*\t0\t0\tGTA\tIII"
        "\tX0:i:1\tX1:i:2\tOQ:Z:JJJ\tOS:Z:GTACG\n")
    monkeypatch.setattr(_sys, "stdin", _io.StringIO(sam))
    r = run(["clippedmappings"])
    assert r.stdout == "@r2\nGTACG\n+\nJJJ\n"

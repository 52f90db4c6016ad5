"""Real-world-messy inputs: N gap runs, lowercase soft-masking, IUPAC
codes, header comments, varied FASTA line widths, reads with N/lowercase/
IUPAC characters, a gap-crossing read, and length extremes (950bp ok,
1100bp over DEF_LONGEST_READ -> intake drop with the exact warning,
10bp shorter than any seed).

Goldens produced by the reference binary:
  gmapper-ls -N 1 -Q messy_reads.fq messy_genome.fa
  gmapper-cs -N 1 -Q messy_reads_cs.fq messy_genome.fa
  gmapper-ls -N 1 -Q -p opp-in -I 0,500 messy_pairs.fq messy_genome.fa
    (one over-length mate, one low-avg-qv mate -> Pairs Dropped: 2)
"""

import os

from cli_helper import run_gmapper

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def _run(args):
    r = run_gmapper(args, cwd=ROOT)
    assert r.returncode == 0, r.stderr
    return r


def _check(r, golden):
    got = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, golden)) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)


def test_messy_unpaired_ls():
    r = _run(["--mode", "ls", "-Q",
              os.path.join(GOLDEN, "messy_reads.fq"),
              os.path.join(GOLDEN, "messy_genome.fa")])
    _check(r, "golden_messy_unpaired.sam")
    # exact intake-drop warning + statistics accounting (gmapper.c:507,933)
    assert ("warning: skipping read [mr_long1100]; it has length 1100, "
            "maximum allowed is 1000. Use --longest-read ?") in r.stderr
    assert "Reads Dropped:          1    (2.2727%)" in r.stderr


def test_messy_unpaired_cs():
    r = _run(["--mode", "cs", "-Q",
              os.path.join(GOLDEN, "messy_reads_cs.fq"),
              os.path.join(GOLDEN, "messy_genome.fa")])
    _check(r, "golden_messy_cs.sam")


def test_messy_paired_intake_drops():
    r = _run(["--mode", "ls", "-Q", "-p", "opp-in", "-I", "0,500",
              os.path.join(GOLDEN, "messy_pairs.fq"),
              os.path.join(GOLDEN, "messy_genome.fa")])
    _check(r, "golden_messy_paired.sam")
    assert "warning: skipping read [drop1/1]" in r.stderr
    # one over-length mate + one low-avg-qv mate, counted per failing read
    assert ("Pairs Dropped:                          2    (16.6667%)"
            in r.stderr)


def test_stderr_notes_parity():
    """The reads-file open notes, quality-format note, and progress header
    in the reference's exact order and text (fasta.c:113-121,
    gmapper.c:2871-2898,320-322)."""
    r = _run(["--mode", "ls", "-Q",
              os.path.join(GOLDEN, "messy_reads.fq"),
              os.path.join(GOLDEN, "messy_genome.fa")])
    lines = r.stderr.splitlines()
    rf = os.path.join(GOLDEN, "messy_reads.fq")
    i0 = lines.index("Loaded Genome")
    assert lines[i0 + 1] == (
        f"note: detected fastq format in input file [{rf}]")
    assert lines[i0 + 2] == f"- Processing read file [{rf}]"
    assert lines[i0 + 3] == ("note: quality value format not set "
                             "explicitly; using PHRED+64")
    assert lines[i0 + 4] == "done r/hr r/core-hr"

"""The reference's own pairing worked-spec fixture, all four pair modes.

`not_in_dist/test_pairing/{reads,reference}-pairing.fa` is the reference
tree's manual fixture for exercising opp-in/opp-out/col-fw/col-bw
(README:972-997 documents the insert-size geometry). Goldens were produced
by the reference binary (FASTQ-converted reads, PHRED+64 'h' quals — the
reference segfaults on FASTA reads on modern glibc):

  gmapper-ls -N 1 -Q -p <mode> pairing_reads.fq pairing_genome.fa
"""

import os

import pytest

from cli_helper import run_gmapper

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


@pytest.mark.parametrize("mode", ["opp-in", "opp-out", "col-fw", "col-bw"])
def test_pairing_fixture_byte_equality(mode):
    r = run_gmapper(["--mode", "ls", "-Q", "-p", mode,
                     os.path.join(GOLDEN, "pairing_reads.fq"),
                     os.path.join(GOLDEN, "pairing_genome.fa")], cwd=ROOT)
    assert r.returncode == 0, r.stderr
    got = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, f"golden_pairing_{mode}.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)

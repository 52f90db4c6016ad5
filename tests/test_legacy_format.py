"""Legacy SHRiMP output-format parity (gmapper --shrimp-format)."""

import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run_cli(args):
    from cli_helper import run_gmapper
    return run_gmapper(args, cwd=ROOT)


@pytest.mark.parametrize("golden,args", [
    ("golden_legacy_ls.out",
     ["--mode", "ls", "-Q", "--shrimp-format",
      "tests/golden/mini_reads.fq", "tests/golden/golden_genome.fa"]),
    ("golden_legacy_cs.out",
     ["--mode", "cs", "-Q", "--shrimp-format",
      "tests/golden/mini_reads_cs.fq", "tests/golden/golden_genome.fa"]),
    ("golden_legacy_paired.out",
     ["--mode", "ls", "-Q", "--shrimp-format", "-R", "-p", "opp-in",
      "tests/golden/mini_pairs.fq", "tests/golden/golden_genome.fa"]),
])
def test_legacy_parity(golden, args):
    r = run_cli(args)
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, golden)) as fh:
        assert r.stdout == fh.read()


def test_editstring_roundtrip_counts():
    from shrimp_tpu.io import legacy
    c = legacy.editstr_to_counts("15A9")
    assert (c.matches, c.mismatches) == (24, 1)
    c = legacy.editstr_to_counts("3(TGCT)20")
    assert (c.matches, c.deletions) == (23, 4)
    c = legacy.editstr_to_counts("5----20")
    assert (c.matches, c.insertions) == (25, 4)
    c = legacy.editstr_to_counts("4x15x6")
    assert (c.matches, c.crossovers) == (25, 2)

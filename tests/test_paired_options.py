"""--paired-options multi-round option sets: byte-exact SAM parity.

Golden fixtures produced by the reference binary (SHRiMP2 v2.2.2) with the
experimental multi-set paired option strings (gmapper.c:2181-2199, case 28;
handle_readpair's option-set do/while, mapping.c:2486-2568):

  golden_po_3set.sam   gmapper-ls -Q -p opp-in golden_pairs.fq golden_genome.fa
                       -N 1 --paired-options S1 --paired-options S2
                       --paired-options S3
  golden_po_reuse.sam  two sets; the second reuses the first round's hit
                       lists and pass1 scores (all recompute flags false)
  golden_po_cs2set.sam gmapper-cs two-set variant (--qv-offset 33)

The last set of every config has stop_count=0 so no pair falls through all
sets: the reference SEGVs in its half-paired fallback when --paired-options
is given without --unpaired-options (handle_read with a NULL option array,
mapping.c:2574 -> 1809).  That fallback path is exercised separately by the
default-set golden suites.
"""

import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

S1 = ("opp-in,150,250,30,50.0,10,60.0,2,85.0,0,1;"
      "1/1,1,1,0/1,0,2,60.0/1,55.0,90.0,2,0,1/30.0;"
      "1/1,1,1,0/1,0,2,60.0/1,55.0,90.0,2,0,1/30.0")
S2 = ("opp-in,50,600,30,50.0,10,50.0,1,70.0,0,1;"
      "0/0/0/1,50.0,90.0,1,0,1/25.0;"
      "0/0/0/1,50.0,90.0,1,0,1/25.0")
S3 = ("opp-in,0,2000,40,45.0,10,40.0,0,50.0,1,1;"
      "1/1,1,0,0/1,0,1,50.0/1,45.0,80.0,1,0,1/20.0;"
      "1/1,1,0,0/1,0,1,50.0/1,45.0,80.0,1,0,1/20.0")

RA = ("opp-in,100,300,30,50.0,10,50.0,1,80.0,0,1;"
      "1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0;"
      "1/1,1,1,0/1,0,2,55.0/1,50.0,90.0,2,0,1/25.0")
RB = ("opp-in,0,1500,30,50.0,10,40.0,0,50.0,0,1;"
      "0/0/0/0/20.0;0/0/0/0/20.0")

CS1 = ("opp-in,100,300,30,47.0,10,50.0,1,90.0,0,1;"
       "1/1,1,1,0/1,0,2,55.0/1,47.0,90.0,2,0,1/25.0;"
       "1/1,1,1,0/1,0,2,55.0/1,47.0,90.0,2,0,1/25.0")
CS2 = ("opp-in,0,1200,30,47.0,10,40.0,0,50.0,0,1;"
       "1/1,1,1,0/1,0,2,50.0/1,45.0,90.0,1,0,1/20.0;"
       "1/1,1,1,0/1,0,2,50.0/1,45.0,90.0,1,0,1/20.0")


def _run_and_compare(args, golden_name):
    from cli_helper import run_gmapper
    out = run_gmapper(args, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    with open(os.path.join(GOLDEN, golden_name)) as f:
        want = [ln for ln in f.read().splitlines()
                if not ln.startswith("@PG")]
    got = [ln for ln in out.stdout.splitlines() if not ln.startswith("@PG")]
    assert got == want


@pytest.mark.parametrize("config,golden", [
    (["-Q", "-p", "opp-in",
      os.path.join(GOLDEN, "golden_pairs.fq"),
      os.path.join(GOLDEN, "golden_genome.fa"), "-N", "1",
      "--paired-options", S1, "--paired-options", S2,
      "--paired-options", S3], "golden_po_3set.sam"),
    (["-Q", "-p", "opp-in",
      os.path.join(GOLDEN, "golden_pairs.fq"),
      os.path.join(GOLDEN, "golden_genome.fa"), "-N", "1",
      "--paired-options", RA, "--paired-options", RB],
     "golden_po_reuse.sam"),
    (["--mode", "cs", "-Q", "-p", "opp-in",
      os.path.join(GOLDEN, "pairs_cs_opp-in.fq"),
      os.path.join(GOLDEN, "golden_genome.fa"), "-N", "1",
      "--qv-offset", "33",
      "--paired-options", CS1, "--paired-options", CS2],
     "golden_po_cs2set.sam"),
], ids=["ls-3set", "ls-reuse", "cs-2set"])
def test_paired_options_golden(config, golden):
    _run_and_compare(config, golden)


def test_paired_all_contigs_suppresses_z_fields():
    """--all-contigs in paired mode: every final hit emitted, Z2-Z6 merge
    fields suppressed (output.c:691,1119). Golden from the reference:
    gmapper-ls -N 1 -p opp-in --all-contigs -Q golden_pairs.fq ..."""
    _run_and_compare(
        ["-Q", "-p", "opp-in", "--all-contigs",
         os.path.join(GOLDEN, "golden_pairs.fq"),
         os.path.join(GOLDEN, "golden_genome.fa")],
        "golden_paired_allcontigs.sam")

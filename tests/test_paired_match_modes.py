"""Paired match modes -n 2/3/4 and --no-half-paired: byte-exact SAM parity.

These configurations exercise the mate-pair region-count machinery
(read_get_mp_region_counts + advance_index_in_genomemap modes 1-3,
mapping.c:560-748) and hit-list match_mode 3 heavy_mp handling
(mapping.c:1108-1185), plus the score_vector overwrite by pass2's
hit_run_full_sw (mapping.c:400-404) that shapes the half-paired fallback's
window suppression.

Goldens produced by the reference binary:
    gmapper-ls -Q -p opp-in [-n N] [--no-half-paired]
        golden_pairs.fq golden_genome.fa -N 1
"""

import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("extra,golden", [
    (["-n", "2"], "golden_paired_n2.sam"),
    (["-n", "3"], "golden_paired_n3.sam"),
    (["--no-half-paired"], "golden_paired_nhp.sam"),
    (["-n", "3", "--no-half-paired"], "golden_paired_n3nhp.sam"),
], ids=["n2", "n3", "nhp", "n3-nhp"])
def test_paired_match_modes(extra, golden):
    from cli_helper import run_gmapper
    out = run_gmapper(["-Q", "-p", "opp-in",
                       os.path.join(GOLDEN, "golden_pairs.fq"),
                       os.path.join(GOLDEN, "golden_genome.fa"),
                       "-N", "1"] + extra, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    with open(os.path.join(GOLDEN, golden)) as f:
        want = [ln for ln in f.read().splitlines()
                if not ln.startswith("@PG")]
    got = [ln for ln in out.stdout.splitlines() if not ln.startswith("@PG")]
    assert got == want

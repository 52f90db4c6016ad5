"""--enable-seed-qual-filter parity (SQFflag, gmapper.h:408-455,
mapping.c:78,936).

The shipped binary's filter literally discards HIGH-quality kmers (the
is_low_quality_read_subsequence comparison is inverted relative to its
name); we replicate the deployed behaviour byte-for-byte.  The two call
sites also index the quality window differently (absolute r_idx at the
mapidx site vs bare slot index at the anchor site), which diverges in
colour space (min_kmer_pos = 1) — covered by the CS cases below.

Goldens produced by the reference binary on mixed-quality corpora
(10-high/10-low PHRED stretches so the filter acts partially):
  gmapper-ls -N 1 -Q [-p opp-in -I 0,500 | -n 2] --enable-seed-qual-filter
  gmapper-cs -N 1 -Q [-p opp-in -I 0,500] --enable-seed-qual-filter
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from cli_helper import run_gmapper

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def _diff(args, golden):
    r = run_gmapper(args, cwd=ROOT)
    assert r.returncode == 0, r.stderr
    got = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, golden)) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)


def test_sqf_unpaired_ls():
    _diff(["--mode", "ls", "-Q", "--enable-seed-qual-filter",
           os.path.join(GOLDEN, "sqf_reads.fq"),
           os.path.join(GOLDEN, "golden_genome.fa")],
          "golden_sqf_unpaired.sam")


def test_sqf_unpaired_ls_match_mode_2():
    # -n 2 turns on unpaired region counts -> bucket-0 visit extras
    _diff(["--mode", "ls", "-Q", "-n", "2", "--enable-seed-qual-filter",
           os.path.join(GOLDEN, "sqf_reads.fq"),
           os.path.join(GOLDEN, "golden_genome.fa")],
          "golden_sqf_n2.sam")


def test_sqf_paired_ls():
    _diff(["--mode", "ls", "-Q", "-p", "opp-in", "-I", "0,500",
           "--enable-seed-qual-filter",
           os.path.join(GOLDEN, "sqf_pairs.fq"),
           os.path.join(GOLDEN, "golden_genome.fa")],
          "golden_sqf_paired.sam")


def test_sqf_unpaired_cs():
    # exercises the off-by-one double mask (min_kmer_pos = 1)
    _diff(["--mode", "cs", "-Q", "--enable-seed-qual-filter",
           os.path.join(GOLDEN, "sqf_reads_cs.fq"),
           os.path.join(GOLDEN, "golden_genome.fa")],
          "golden_sqf_cs.sam")


def test_sqf_paired_cs():
    _diff(["--mode", "cs", "-Q", "-p", "opp-in", "-I", "0,500",
           "--enable-seed-qual-filter",
           os.path.join(GOLDEN, "sqf_pairs_cs.fq"),
           os.path.join(GOLDEN, "golden_genome.fa")],
          "golden_sqf_cs_paired.sam")


def test_sqf_all_high_quality_filters_everything():
    """All decent-quality corpora map to nothing under the filter (the
    reference's observed behaviour on the golden reads)."""
    r = run_gmapper(["--mode", "ls", "-Q", "--enable-seed-qual-filter",
                     os.path.join(GOLDEN, "golden_reads.fq"),
                     os.path.join(GOLDEN, "golden_genome.fa")], cwd=ROOT)
    assert r.returncode == 0, r.stderr
    assert not [l for l in r.stdout.splitlines() if not l.startswith("@")]


def test_cunit_quality_filter_vectors():
    """The reference's own CUnit vectors (tests/test.c:200-245):
    read_quality_filter_preprocess + is_low_quality_read_subsequence with
    seed 111001101011 over the 20-value processed-quality array."""
    from shrimp_tpu import seeds
    from shrimp_tpu.pipeline.candidates import apply_seed_qual_filter

    processed = [10, 10, 10, 10, 10, 10, 5, 7, 0, 3,
                 3, 10, 10, 10, 0, 6, 0, 4, 4, 3]
    # preprocess is idempotent at qual_delta 0, so feeding the processed
    # array reproduces the CUnit setup exactly
    e = SimpleNamespace(name="cunit", qual="".join(map(chr, processed)),
                        read_len=20, min_kmer_pos=0,
                        sqf=None, sqf_mapidx=None)
    ss = seeds.make_seed_set(["111001101011"])
    apply_seed_qual_filter([e], ss, qual_delta=0)
    expected = [1, 1, 1, 1, 0, 1, 0, 0, 0]   # __QUAL_LEN - span + 1 = 9
    np.testing.assert_array_equal(e.sqf[0].astype(int), expected)
    np.testing.assert_array_equal(e.sqf_mapidx[0].astype(int), expected)


def test_sqf_all_untrusted_raises():
    """An all-untrusted seed window makes the reference exit(1)
    (gmapper.h:448-455); we raise the equivalent error."""
    from shrimp_tpu import seeds
    from shrimp_tpu.pipeline.candidates import apply_seed_qual_filter

    e = SimpleNamespace(name="bad", qual=chr(0) * 20, read_len=20,
                        min_kmer_pos=0, sqf=None, sqf_mapidx=None)
    ss = seeds.make_seed_set(["111001101011"])
    with pytest.raises(ValueError, match="all-untrusted"):
        apply_seed_qual_filter([e], ss, qual_delta=0)

"""Reference index-file interop (.genome/.seed.N, genome.c:15-273,670-833).

The committed fixture `tests/golden/refproj.*` was produced by the
reference binary: `gmapper-ls -S refproj golden_genome.fa`."""

import os
import subprocess
import sys

import numpy as np
import pytest

from shrimp_tpu import index as gindex
from shrimp_tpu import seeds as seedmod
from shrimp_tpu.io import fastx, refindex

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))
PREFIX = os.path.join(GOLDEN, "refproj")


def build_from_fasta():
    contigs = list(fastx.iter_contigs(
        os.path.join(GOLDEN, "golden_genome.fa")))
    return gindex.build_index(contigs, seedmod.make_seed_set(None),
                              colour_space=False)


def test_load_reference_projection_identical():
    """A reference -S projection loads bit-identical to building the index
    from FASTA (same CSR, same genome plane, same seeds)."""
    ridx = refindex.load(PREFIX)
    ours = build_from_fasta()
    assert ridx.contig_names == ours.contig_names
    assert (ridx.contig_len == ours.contig_len).all()
    assert (ridx.genome == ours.genome).all()
    assert [s.pattern for s in ridx.seed_set.seeds] == \
        [s.pattern for s in ours.seed_set.seeds]
    for sn in range(len(ours.offsets)):
        assert (ridx.offsets[sn] == ours.offsets[sn]).all()
        assert (ridx.positions[sn] == ours.positions[sn]).all()


def test_write_round_trip(tmp_path):
    ours = build_from_fasta()
    refindex.save(ours, str(tmp_path / "rt"))
    back = refindex.load(str(tmp_path / "rt"))
    assert (back.genome == ours.genome).all()
    for sn in range(len(ours.offsets)):
        assert (back.positions[sn] == ours.positions[sn]).all()


def test_cli_maps_from_reference_projection():
    """gmapper -L <reference projection> maps byte-identically to mapping
    from the FASTA-built index (VERDICT round-trip criterion)."""
    from cli_helper import run_gmapper
    r = run_gmapper(["-L", PREFIX, "-Q",
                     os.path.join(GOLDEN, "golden_reads.fq")], cwd=ROOT)
    assert r.returncode == 0, r.stderr
    got = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, "golden_unpaired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert got == want

"""End-to-end colour-space golden test: byte-exact SAM parity with the
reference gmapper-cs.

Corpus produced by the reference binary (SHRiMP2 v2.2.2, built from
/root/reference) with:

    gmapper-cs -Q golden_reads_cs.fq golden_genome.fa -N 1 > golden_cs.sam

on the 2-contig 50kb golden genome and 200 SOLiD-style colour-space reads
(35/50bp, SNPs/indels/colour errors, both strands, PHRED+33 quality values).
"""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def mapped_lines():
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))),
        colour_space=True)
    cfg = MapperConfig(colour_space=True, params=SWParams.colour_space(),
                       qual_delta=33)
    m = Mapper(idx, cfg)
    reads = [(r.name, r.seq, r.qual)
             for r in fastx.iter_reads(os.path.join(GOLDEN,
                                                    "golden_reads_cs.fq"))]
    out = m.map_batch(reads)
    lines = []
    for re, hits in out:
        for rec in m.sam_records(re, hits):
            lines.append(rec.line())
    return lines


def test_sam_byte_equality(mapped_lines):
    with open(os.path.join(GOLDEN, "golden_cs.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert len(mapped_lines) == len(golden), \
        f"{len(mapped_lines)} records vs {len(golden)} golden"
    for i, (g, m) in enumerate(zip(golden, mapped_lines)):
        assert g == m, f"line {i}:\n  golden: {g}\n  mine:   {m}"


def test_bfast_quals():
    """gmapper-cs -Q -B parity (bfast-style colour-quality blending)."""
    import subprocess
    import sys
    from cli_helper import run_gmapper
    r = run_gmapper(["--mode", "cs", "-Q", "--bfast",
                     os.path.join(GOLDEN, "mini_reads_cs.fq"),
                     os.path.join(GOLDEN, "golden_genome.fa")],
                    cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    mine = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, "golden_cs_bfast.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert mine == golden

"""End-to-end golden test: byte-exact SAM parity with reference gmapper-ls.

The corpus in tests/golden/ was produced by the reference binary
(SHRiMP2 v2.2.2, built from /root/reference) with:

    gmapper-ls -Q golden_reads.fq golden_genome.fa -N 1 > golden_unpaired.sam

on a 2-contig 50kb random genome and 200 reads (36/50bp) containing SNPs,
indels, both strands, and unmappable junk.  See tests/golden/README.md.
"""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def mapped_lines():
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))))
    m = Mapper(idx, MapperConfig(qual_delta=64))
    reads = [(r.name, r.seq, r.qual)
             for r in fastx.iter_reads(os.path.join(GOLDEN, "golden_reads.fq"))]
    out = m.map_batch(reads)
    lines = []
    for re, hits in out:
        for rec in m.sam_records(re, hits):
            lines.append(rec.line())
    return lines


def test_sam_byte_equality(mapped_lines):
    with open(os.path.join(GOLDEN, "golden_unpaired.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert len(mapped_lines) == len(golden)
    for i, (g, m) in enumerate(zip(golden, mapped_lines)):
        assert g == m, f"line {i}:\n  golden: {g}\n  mine:   {m}"


def test_long_reads_byte_equality():
    """454-length reads (150-400bp mixed, indels, both strands) vs the
    reference binary's output (generated 2026-08-17; see PARITY.md)."""
    import os

    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    golden = os.path.join(os.path.dirname(__file__), "golden")
    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(golden, "golden_genome.fa"))))
    m = Mapper(idx, MapperConfig(qual_delta=64))
    reads = [(r.name, r.seq, r.qual) for r in
             fastx.iter_reads(os.path.join(golden, "long_reads.fq"))]
    lines = []
    for re_e, hits in m.map_batch(reads):
        for rec in m.sam_records(re_e, hits):
            lines.append(rec.line())
    with open(os.path.join(golden, "golden_long_reads.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert lines == want

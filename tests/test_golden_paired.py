"""End-to-end golden test: byte-exact paired-end SAM parity with reference
gmapper-ls -p opp-in (see tests/golden/README.md)."""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_paired_sam_byte_equality():
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.paired import (PAIR_OPP_IN, PairedConfig,
                                            PairedMapper)
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))))
    m = PairedMapper(idx, MapperConfig(qual_delta=64),
                     PairedConfig(pair_mode=PAIR_OPP_IN))
    recs = list(fastx.iter_reads(os.path.join(GOLDEN, "golden_pairs.fq")))
    pairs = [((recs[i].name, recs[i].seq, recs[i].qual),
              (recs[i + 1].name, recs[i + 1].seq, recs[i + 1].qual))
             for i in range(0, len(recs), 2)]
    out = m.map_pair_batch(pairs)
    lines = []
    for pr in out:
        for rec in m.sam_records_pair(pr):
            lines.append(rec.line())
    with open(os.path.join(GOLDEN, "golden_paired.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert len(lines) == len(golden)
    for i, (g, mine) in enumerate(zip(golden, lines)):
        assert g == mine, f"line {i}:\n  golden: {g}\n  mine:   {mine}"


@pytest.mark.parametrize("mode_name,mode", [
    ("opp-out", 2), ("col-fw", 3), ("col-bw", 4)])
def test_other_pair_modes(mode_name, mode):
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))))
    m = PairedMapper(idx, MapperConfig(qual_delta=64),
                     PairedConfig(pair_mode=mode))
    recs = list(fastx.iter_reads(
        os.path.join(GOLDEN, f"pairs_{mode_name}.fq")))
    pairs = [((recs[i].name, recs[i].seq, recs[i].qual),
              (recs[i + 1].name, recs[i + 1].seq, recs[i + 1].qual))
             for i in range(0, len(recs), 2)]
    lines = []
    for pr in m.map_pair_batch(pairs):
        for rec in m.sam_records_pair(pr):
            lines.append(rec.line())
    with open(os.path.join(GOLDEN, f"golden_{mode_name}.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert lines == golden

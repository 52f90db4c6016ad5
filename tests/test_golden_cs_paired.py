"""End-to-end CS paired golden tests: byte-exact SAM parity with reference
gmapper-cs -p {opp-in, col-fw} (see tests/golden/gen_golden_cs_pairs.py)."""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_mode(mode_name, pair_mode):
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))),
        colour_space=True)
    cfg = MapperConfig(colour_space=True, params=SWParams.colour_space(),
                       qual_delta=33)
    m = PairedMapper(idx, cfg, PairedConfig(pair_mode=pair_mode))
    recs = list(fastx.iter_reads(
        os.path.join(GOLDEN, f"pairs_cs_{mode_name}.fq")))
    pairs = [((recs[i].name, recs[i].seq, recs[i].qual),
              (recs[i + 1].name, recs[i + 1].seq, recs[i + 1].qual))
             for i in range(0, len(recs), 2)]
    out = m.map_pair_batch(pairs)
    lines = []
    for pr in out:
        for rec in m.sam_records_pair(pr):
            lines.append(rec.line())
    with open(os.path.join(GOLDEN, f"golden_cs_{mode_name}.sam")) as fh:
        golden = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    assert len(lines) == len(golden), \
        f"{len(lines)} records vs {len(golden)} golden"
    for i, (g, mine) in enumerate(zip(golden, lines)):
        assert g == mine, f"line {i}:\n  golden: {g}\n  mine:   {mine}"


def test_cs_opp_in():
    from shrimp_tpu.pipeline.paired import PAIR_OPP_IN
    run_mode("opp-in", PAIR_OPP_IN)


def test_cs_col_fw():
    from shrimp_tpu.pipeline.paired import PAIR_COL_FW
    run_mode("col-fw", PAIR_COL_FW)

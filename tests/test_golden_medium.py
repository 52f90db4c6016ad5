"""Medium-corpus byte-parity regression (400 reads / 200 pairs on a 200kb
genome, fresh seeds distinct from the small goldens).  This corpus caught
the CS vector-filter mismatch-score bug the small corpus missed."""

import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def golden_body(name):
    with open(os.path.join(GOLDEN, name)) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@")]


def _map_lines(mode, reads, paired=False):
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig
    from shrimp_tpu.pipeline.paired import (PAIR_OPP_IN, PairedConfig,
                                            PairedMapper)

    colour = mode == "cs"
    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "med_genome.fa"))),
        colour_space=colour)
    cfg = MapperConfig(colour_space=colour,
                       params=(SWParams.colour_space() if colour
                               else SWParams.letter_space()),
                       qual_delta=33 if colour else 64)
    recs = list(fastx.iter_reads(os.path.join(GOLDEN, reads)))
    lines = []
    if paired:
        m = PairedMapper(idx, cfg, PairedConfig(pair_mode=PAIR_OPP_IN))
        pairs = [((recs[i].name, recs[i].seq, recs[i].qual),
                  (recs[i + 1].name, recs[i + 1].seq, recs[i + 1].qual))
                 for i in range(0, len(recs), 2)]
        for pr in m.map_pair_batch(pairs):
            for rec in m.sam_records_pair(pr):
                lines.append(rec.line())
    else:
        m = Mapper(idx, cfg)
        for re_e, hits in m.map_batch([(r.name, r.seq, r.qual)
                                       for r in recs]):
            for rec in m.sam_records(re_e, hits):
                lines.append(rec.line())
    return lines


def _g(name):
    return os.path.join(GOLDEN, name)


def _cli_golden(args, golden_name):
    import subprocess
    import sys
    from cli_helper import run_gmapper
    out = run_gmapper(args, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    want = golden_body(golden_name)
    got = [ln for ln in out.stdout.splitlines() if not ln.startswith("@")]
    assert got == want


def test_medium_ls():
    assert _map_lines("ls", "med_reads.fq") == golden_body("med_ls.sam")


def test_medium_cs():
    assert _map_lines("cs", "med_reads_cs.fq") == golden_body("med_cs.sam")


def test_medium_paired():
    assert _map_lines("ls", "med_pairs.fq", paired=True) == \
        golden_body("med_paired.sam")


def test_medium_hashed_seeds():
    """-H -s w16: the exact kmer_to_mapidx_hash chain (gmapper.h:308-337)."""
    _cli_golden(["-Q", _g("med_reads.fq"), _g("med_genome.fa"), "-N", "1",
                 "-H", "-s", "w16"], "golden_med_h16.sam")


def test_medium_gap_symmetry():
    """-g/-e without -q/-f imply symmetric query penalties
    (gmapper.c:2538-2552)."""
    _cli_golden(["-Q", _g("med_reads.fq"), _g("med_genome.fa"), "-N", "1",
                 "-g", "-400", "-e", "-70"], "golden_med_gapsym.sam")


def test_medium_read_group():
    """--read-group: @RG header + per-record RG:Z tag (output.c:461,739)."""
    _cli_golden(["-Q", _g("med_reads.fq"), _g("med_genome.fa"), "-N", "1",
                 "--read-group", "rg1,sample1"], "golden_med_rg.sam")


def test_medium_extra_sam_fields():
    """--extra-sam-fields: ZM/ZR/ZV/ZH/ZE side channel incl.
    reverse-complemented edit strings (output.c:739-756)."""
    _cli_golden(["-Q", _g("med_reads.fq"), _g("med_genome.fa"), "-N", "1",
                 "--extra-sam-fields"], "golden_med_xf.sam")


def test_paired_sam_r2():
    """--sam-r2: mate sequence R2:Z tag on paired records
    (output.c:452-460)."""
    _cli_golden(["-Q", "-p", "opp-in", _g("golden_pairs.fq"),
                 _g("golden_genome.fa"), "-N", "1", "--sam-r2"],
                "golden_paired_r2.sam")

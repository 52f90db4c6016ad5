"""In-memory sharded mapping: ShardedMapper over per-contig index shards
must reproduce the whole-genome mapping (the split-db/mergesam invariant,
full-precision z recombination)."""

import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_sharded_equals_whole():
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.parallel.shard import ShardedMapper
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    contigs = list(fastx.iter_contigs(
        os.path.join(GOLDEN, "golden_genome.fa")))
    whole = gindex.build_index(contigs)
    shards = [gindex.build_index([c]) for c in contigs]

    cfg = MapperConfig(qual_delta=64)
    m_whole = Mapper(whole, cfg)
    m_shard = ShardedMapper(shards, MapperConfig(qual_delta=64))

    reads = [(r.name, r.seq, r.qual)
             for r in fastx.iter_reads(os.path.join(GOLDEN,
                                                    "mini_reads.fq"))]
    res_w = m_whole.map_batch(reads)
    res_s = m_shard.map_batch(reads)

    for (e_w, hits_w), (e_s, hits_s) in zip(res_w, res_s):
        assert len(hits_w) == len(hits_s), e_w.name
        for hw, (sn, hs) in zip(hits_w, hits_s):
            assert m_whole.index.contig_names[hw.cn] == \
                m_shard.contig_name(sn, hs.cn)
            assert (hw.gen_st, hw.g_off + hw.genome_start) == \
                (hs.gen_st, hs.g_off + hs.genome_start)
            assert hw.score_full == hs.score_full
            # full-precision z recombination: MQVs match exactly here
            assert hw.mqv == hs.mqv, e_w.name

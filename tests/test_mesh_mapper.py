"""Production mesh mapping: MeshMapper (genome shards on the device mesh,
collective z recombination) must emit byte-identical SAM to the
single-device Mapper — the reference's shard-invariance guarantee
(SPLITTING_AND_MERGING:100-148) on the mesh."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def build_corpus(n_contigs=8, contig_len=12_000, n_reads=120, seed=21):
    from shrimp_tpu import dna
    from shrimp_tpu.io import fastx
    rng = np.random.default_rng(seed)
    contigs = [fastx.Contig(name=f"ctg{i:02d}",
                            codes=rng.integers(0, 4, contig_len)
                            .astype(np.int8))
               for i in range(n_contigs)]
    genome = np.concatenate([c.codes for c in contigs])
    offs = np.cumsum([0] + [contig_len] * (n_contigs - 1))
    reads = []
    for i in range(n_reads):
        ci = int(rng.integers(0, n_contigs))
        p = int(rng.integers(0, contig_len - 50))
        r = contigs[ci].codes[p:p + 50].copy()
        for _ in range(int(rng.integers(0, 3))):
            q = int(rng.integers(0, 50))
            r[q] = (r[q] + int(rng.integers(1, 4))) % 4
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append((f"r{i:03d}", dna.decode(r), "I" * 50))
    return contigs, reads


def sam_lines(mapper, results):
    lines = []
    for entry, hits in results:
        for rec in mapper.sam_records(entry, hits):
            lines.append(rec.line())
    return lines


def mesh_sam_lines(mm, results):
    lines = []
    for entry, shard_hits in results:
        for rec in mm.sam_records(entry, shard_hits):
            lines.append(rec.line())
    return lines


def test_mesh_equals_single_device():
    from shrimp_tpu import index as gindex
    from shrimp_tpu.parallel.mesh import MeshMapper, split_index_shards
    from shrimp_tpu.parallel.shard import make_mesh
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    contigs, reads = build_corpus()
    whole = gindex.build_index(contigs)
    shards = split_index_shards(contigs, 4)
    assert len(shards) == 4

    cfg = MapperConfig(qual_delta=64)
    single = Mapper(whole, cfg)
    mesh = make_mesh(8, genome_shards=4)      # 2 reads x 4 genome
    mm = MeshMapper(shards, MapperConfig(qual_delta=64), mesh=mesh)

    res_single = single.map_batch(reads)
    res_mesh = mm.map_batch(reads)

    want = sam_lines(single, res_single)
    got = mesh_sam_lines(mm, res_mesh)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        assert w == g, (w, g)


def test_mesh_matches_file_workflow():
    """The on-mesh merge equals the offline splitdb+per-shard-map+merge
    algebra (same hits, scores, MQVs)."""
    from shrimp_tpu import index as gindex
    from shrimp_tpu.parallel.mesh import MeshMapper, split_index_shards
    from shrimp_tpu.parallel.shard import ShardedMapper, make_mesh
    from shrimp_tpu.pipeline.options import MapperConfig

    contigs, reads = build_corpus(seed=33)
    shards = split_index_shards(contigs, 4)
    mm = MeshMapper(shards, MapperConfig(qual_delta=64),
                    mesh=make_mesh(4, genome_shards=4))
    sm = ShardedMapper([gindex.build_index([c]) for c in contigs],
                       MapperConfig(qual_delta=64))

    res_mesh = mm.map_batch(reads)
    res_file = sm.map_batch(reads)
    for (e1, mh), (e2, fh) in zip(res_mesh, res_file):
        assert len(mh) == len(fh), e1.name
        for (s1, h1), (s2, h2) in zip(mh, fh):
            assert mm.contig_name(s1, h1.cn) == sm.contig_name(s2, h2.cn)
            assert (h1.gen_st, h1.g_off + h1.genome_start, h1.score_full,
                    h1.mqv) == \
                   (h2.gen_st, h2.g_off + h2.genome_start, h2.score_full,
                    h2.mqv), e1.name


def build_pair_corpus(n_contigs=8, contig_len=12_000, n_pairs=60, seed=33):
    """opp-in pairs planted with inserts in [120, 360] + mutations."""
    from shrimp_tpu import dna
    from shrimp_tpu.io import fastx
    rng = np.random.default_rng(seed)
    contigs = [fastx.Contig(name=f"ctg{i:02d}",
                            codes=rng.integers(0, 4, contig_len)
                            .astype(np.int8))
               for i in range(n_contigs)]
    pairs = []
    for i in range(n_pairs):
        ci = int(rng.integers(0, n_contigs))
        isz = int(rng.integers(120, 360))
        p = int(rng.integers(0, contig_len - isz - 1))
        r1 = contigs[ci].codes[p:p + 50].copy()
        r2 = dna.reverse_complement(
            contigs[ci].codes[p + isz - 50:p + isz].copy())
        for r in (r1, r2):
            for _ in range(int(rng.integers(0, 3))):
                q = int(rng.integers(0, 50))
                r[q] = (r[q] + int(rng.integers(1, 4))) % 4
        pairs.append(((f"p{i:03d}/1", dna.decode(r1), "I" * 50),
                      (f"p{i:03d}/2", dna.decode(r2), "I" * 50)))
    return contigs, pairs


def test_mesh_paired_equals_single_device():
    """MeshPairedMapper (per-shard paired funnels + Part-2c psum
    recombination + global bounded selection) == single-device
    PairedMapper, byte-for-byte."""
    from shrimp_tpu import index as gindex
    from shrimp_tpu.parallel.mesh import MeshPairedMapper, \
        split_index_shards
    from shrimp_tpu.parallel.shard import make_mesh
    from shrimp_tpu.pipeline.options import MapperConfig
    from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper

    contigs, pairs = build_pair_corpus()
    whole = gindex.build_index(contigs)
    shards = split_index_shards(contigs, 4)

    cfg = MapperConfig(qual_delta=64)
    pcfg = PairedConfig(pair_mode=1, min_insert_size=0,
                        max_insert_size=500)
    single = PairedMapper(whole, cfg, pcfg)
    mesh = make_mesh(8, genome_shards=4)
    mm = MeshPairedMapper(shards, MapperConfig(qual_delta=64),
                          PairedConfig(pair_mode=1, min_insert_size=0,
                                       max_insert_size=500), mesh=mesh)

    res_single = single.map_pair_batch(pairs)
    res_mesh = mm.map_pair_batch(pairs)

    want = []
    for pr in res_single:
        for rec in single.sam_records_pair(pr):
            want.append(rec.line())
    got = []
    for pr, tp, tu in res_mesh:
        for rec in mm.sam_records_pair(pr, tp, tu):
            got.append(rec.line())
    assert len(want) == len(got), (len(want), len(got))
    for w, g in zip(want, got):
        assert w == g, (w, g)


@pytest.mark.parametrize("policy", [
    {"strata": True},
    {"max_alignments": 2},
])
def test_mesh_paired_policies_equal_single(policy):
    """--strata / --max-alignments act on the CROSS-shard candidate set:
    shard funnels run them neutralized, the merge applies them — output
    must equal the single-index run byte-for-byte."""
    from shrimp_tpu import index as gindex
    from shrimp_tpu.parallel.mesh import MeshPairedMapper, \
        split_index_shards
    from shrimp_tpu.parallel.shard import make_mesh
    from shrimp_tpu.pipeline.options import MapperConfig
    from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper

    contigs, pairs = build_pair_corpus(n_pairs=40, seed=55)
    whole = gindex.build_index(contigs)
    shards = split_index_shards(contigs, 4)
    pc = dict(pair_mode=1, min_insert_size=0, max_insert_size=500)

    single = PairedMapper(whole, MapperConfig(qual_delta=64, **policy),
                          PairedConfig(**pc))
    mm = MeshPairedMapper(shards, MapperConfig(qual_delta=64, **policy),
                          PairedConfig(**pc),
                          mesh=make_mesh(8, genome_shards=4))
    want = [rec.line() for pr in single.map_pair_batch(pairs)
            for rec in single.sam_records_pair(pr)]
    got = [rec.line() for pr, tp, tu in mm.map_pair_batch(pairs)
           for rec in mm.sam_records_pair(pr, tp, tu)]
    assert want == got, (len(want), len(got))

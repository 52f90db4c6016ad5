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

"""mergesam parity tests.

Fixtures in tests/golden/shards/ were produced by the reference binaries:
the golden genome split into its two contigs, gmapper run per shard, and the
reference mergesam (v2.2.0) run over the shard SAMs with various policies.
Our mergesam must reproduce every alignment line byte-for-byte.

The final test is the core distributed invariant (SPLITTING_AND_MERGING:
100-148): our own gmapper per shard + our mergesam must reproduce the
whole-genome mapping (positions/CIGAR/flags/MAPQ exactly; Z side-channel
fields may differ by tnlog quantization).
"""

import io
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SHARDS = os.path.join(GOLDEN, "shards")


def run_merge(reads, sams, extra=None):
    from shrimp_tpu.tools import mergesam as ms
    opts = ms.Options()
    opts.sam_format = True
    for k, v in (extra or {}).items():
        setattr(opts, k, v)
    if opts.single_best:
        opts.max_outputs = 1
    buf = io.StringIO()
    ms.merge(reads, sams, opts, out=buf, command_line="test")
    return [l for l in buf.getvalue().splitlines() if not l.startswith("@")]


def golden_body(path):
    with open(path) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@")]


def test_merge_unpaired_parity():
    lines = run_merge(os.path.join(GOLDEN, "golden_reads.fq"),
                      [os.path.join(SHARDS, "map_chrA.sam"),
                       os.path.join(SHARDS, "map_chrB.sam")])
    assert lines == golden_body(os.path.join(SHARDS, "merged.sam"))


def test_merge_paired_parity():
    lines = run_merge(os.path.join(GOLDEN, "golden_pairs.fq"),
                      [os.path.join(SHARDS, "pmap_chrA.sam"),
                       os.path.join(SHARDS, "pmap_chrB.sam")])
    assert lines == golden_body(os.path.join(SHARDS, "pmerged.sam"))


@pytest.mark.parametrize("name,extra", [
    ("sam-unaligned", {"sam_unaligned": True}),
    ("strata", {"strata": True}),
    ("singlebest", {"single_best": True, "all_contigs": True}),
])
def test_merge_paired_policies(name, extra):
    lines = run_merge(os.path.join(GOLDEN, "golden_pairs.fq"),
                      [os.path.join(SHARDS, "pmap_chrA.sam"),
                       os.path.join(SHARDS, "pmap_chrB.sam")],
                      extra)
    assert lines == golden_body(os.path.join(SHARDS, f"pmerged_{name}.sam"))


def _map_sam_lines(genome_path, reads_path):
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx, sam
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx = gindex.build_index(list(fastx.iter_contigs(genome_path)))
    m = Mapper(idx, MapperConfig(qual_delta=64))
    reads = [(r.name, r.seq, r.qual) for r in fastx.iter_reads(reads_path)]
    lines = []
    hdr = sam.sam_header(idx.contig_names,
                         [int(x) for x in idx.contig_len])
    for re_e, hits in m.map_batch(reads):
        for rec in m.sam_records(re_e, hits):
            lines.append(rec.line())
    return hdr, lines


def test_shard_invariance_end_to_end(tmp_path):
    """map(reads, shard_i) + mergesam == map(reads, whole) up to Z fields."""
    # split the golden genome into its contigs
    text = open(os.path.join(GOLDEN, "golden_genome.fa")).read()
    shard_paths = []
    for part in text.split(">")[1:]:
        name = part.split("\n", 1)[0].split()[0]
        p = tmp_path / f"shard_{name}.fa"
        p.write_text(">" + part)
        shard_paths.append(str(p))

    reads_path = os.path.join(GOLDEN, "golden_reads.fq")
    sam_paths = []
    for sp in shard_paths:
        hdr, lines = _map_sam_lines(sp, reads_path)
        out = tmp_path / (os.path.basename(sp) + ".sam")
        out.write_text("\n".join(hdr + lines) + "\n")
        sam_paths.append(str(out))

    merged = run_merge(reads_path, sam_paths)
    _, whole = _map_sam_lines(os.path.join(GOLDEN, "golden_genome.fa"),
                              reads_path)

    def strip_z(line):
        return "\t".join(f for f in line.split("\t")
                         if not f.startswith(("Z0", "Z1")))

    assert len(merged) == len(whole)
    for m_line, w_line in zip(merged, whole):
        assert strip_z(m_line) == strip_z(w_line)

"""End-to-end cluster workflow (SPLITTING_AND_MERGING:57-148): split-db
shards the genome, splitreads shards the reads, independent gmapper runs
map every (read shard x genome shard), mergesam reduces with exact MQV
recombination — final SAM must match the whole-genome, whole-read-set
run (modulo the Z side-channel fields, which the reducer consumes)."""

import os

from cli_helper import run_gmapper, run_module

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _body(text):
    return [l for l in text.splitlines() if l and not l.startswith("@")]


def _strip_z(lines):
    return ["\t".join(f for f in l.split("\t")
                      if not f.startswith(("Z0", "Z1")))
            for l in lines]


def test_splitdb_splitreads_mergesam_roundtrip(tmp_path):
    genome = os.path.join(GOLDEN, "golden_genome.fa")
    reads = os.path.join(GOLDEN, "golden_reads.fq")

    # 1. shard the genome with the RAM-model bin-packing (tiny budget ->
    #    one shard per contig)
    r = run_module("shrimp_tpu.tools.splitdb",
                   ["--ram-size", "0.6117",
                    "--prefix", str(tmp_path / "db"), genome])
    assert r.returncode == 0, r.stderr
    shards = sorted(str(tmp_path / f) for f in os.listdir(tmp_path)
                    if f.endswith(".fa"))
    assert len(shards) >= 2, (r.stdout, r.stderr)

    # 2. shard the reads
    r = run_module("shrimp_tpu.tools.splitreads",
                   ["100", reads, str(tmp_path / "rs")])
    assert r.returncode == 0, r.stderr
    read_shards = sorted(str(tmp_path / f) for f in os.listdir(tmp_path)
                         if f.startswith("rs"))
    assert len(read_shards) >= 2

    # 3. every (read shard x genome shard) mapping job
    sams = []
    for ri, rs in enumerate(read_shards):
        for gi, gs in enumerate(shards):
            r = run_gmapper(["-Q", rs, gs])
            assert r.returncode == 0, r.stderr
            p = tmp_path / f"m{ri}{gi}.sam"
            p.write_text(r.stdout)
            sams.append(str(p))

    # 4. reduce (per read shard, then concatenate read shards in order)
    merged = []
    for ri, rs in enumerate(read_shards):
        shard_sams = [s for s in sams
                      if os.path.basename(s).startswith(f"m{ri}")]
        r = run_module("shrimp_tpu.tools.mergesam",
                       ["-E", "-Q", rs] + shard_sams)
        assert r.returncode == 0, r.stderr
        merged.extend(_body(r.stdout))

    # 5. the whole-genome single run
    r = run_gmapper(["-Q", reads, genome])
    assert r.returncode == 0, r.stderr
    whole = _body(r.stdout)

    assert len(merged) == len(whole)
    assert _strip_z(merged) == _strip_z(whole)

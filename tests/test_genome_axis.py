"""Genome axis across jax.distributed processes: 2 ranks each holding
one genome-index shard map the FULL read stream; z statistics cross the
process boundary (exact f64 all-gather + psum self-check over a Mesh
whose GENOME axis spans the processes); rank-0 assembly reproduces the
single-process whole-genome SAM byte-for-byte (VERDICT r2 #5 — the
cross-host form of SPLITTING_AND_MERGING:57-97 with DCN collectives
replacing the SAM-file side channel)."""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def body(path):
    with open(path) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@")]


def run_ranks(tmp_path, extra, reads, tag):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / f"{tag}.sam")
    genome = os.path.join(GOLDEN, "golden_genome.fa")
    port = 9000 + (os.getpid() + hash(tag)) % 20000
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "shrimp_tpu.parallel.multihost",
             "--genome-axis",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", out,
             "--", "-Q", *extra, reads, genome],
            cwd=ROOT, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=1200)
        assert p.returncode == 0, err.decode()[-2000:]
    return out


def test_genome_axis_unpaired(tmp_path):
    reads = os.path.join(GOLDEN, "golden_reads.fq")
    out = run_ranks(tmp_path, [], reads, "ga_unp")
    with open(os.path.join(GOLDEN, "golden_unpaired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want),
                         [x for x in got[:3]], [x for x in want[:3]])


def test_genome_axis_paired(tmp_path):
    reads = os.path.join(GOLDEN, "golden_pairs.fq")
    out = run_ranks(tmp_path, ["-p", "opp-in", "-I", "0,500"], reads,
                    "ga_pair")
    with open(os.path.join(GOLDEN, "golden_paired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want))


def run_single(tmp_path, args, tag):
    """Single-process whole-genome gmapper run (the parity oracle for
    conditions without a stored golden)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / f"{tag}_single.sam")
    with open(out, "w") as fh:
        p = subprocess.run(
            [sys.executable, "-m", "shrimp_tpu.gmapper", *args],
            cwd=ROOT, env=env, stdout=fh, stderr=subprocess.PIPE)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    return out


def test_genome_axis_cs(tmp_path):
    """Colour-space over the cross-process genome axis (VERDICT r4 #6):
    2 ranks, --mode cs, byte parity vs the stored CS golden."""
    reads = os.path.join(GOLDEN, "golden_reads_cs.fq")
    out = run_ranks(tmp_path, ["--mode", "cs"], reads, "ga_cs")
    with open(os.path.join(GOLDEN, "golden_cs.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want), got[:2], want[:2])


def test_genome_axis_unpaired_option_set(tmp_path):
    """Non-default --unpaired-options string (single round, custom
    thresholds and output count) over the genome axis: byte parity vs a
    fresh single-process run with the same string."""
    reads = os.path.join(GOLDEN, "golden_reads.fq")
    oset = ("0;true/true,true,false/true,false,2,60%/"
            "true,60%,90%,2,false,20/60%,false,true,4/0")
    extra = ["--unpaired-options", oset, "-o", "4"]
    single = run_single(tmp_path, ["-Q", *extra, reads,
                                   os.path.join(GOLDEN, "golden_genome.fa")],
                        "ga_oset")
    out = run_ranks(tmp_path, extra, reads, "ga_oset")
    got = body(out)
    want = body(single)
    assert got == want, (len(got), len(want), got[:2], want[:2])

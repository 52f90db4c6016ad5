"""Multi-host skeleton: 2 simulated processes (jax.distributed process
group on CPU) map disjoint read shares; rank-0 assembly reproduces the
single-process SAM exactly."""

import os
import subprocess
import sys
import time

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def body(path):
    with open(path) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@")]


def test_two_process_mapping(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / "mh.sam")
    reads = os.path.join(GOLDEN, "golden_reads.fq")
    genome = os.path.join(GOLDEN, "golden_genome.fa")
    port = 9000 + os.getpid() % 20000
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "shrimp_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", out, "--block", "50",
             "--", "-Q", reads, genome],
            cwd=ROOT, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=1200)
        errs.append(err.decode())
        assert p.returncode == 0, err.decode()[-2000:]

    with open(os.path.join(GOLDEN, "golden_unpaired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want))


def test_two_process_paired_mapping(tmp_path):
    """Paired multihost: 2 processes, paired-aware block dealing, rank-0
    assembly ordered by the common-prefix-trimmed pair qname."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = str(tmp_path / "mhp.sam")
    reads = os.path.join(GOLDEN, "golden_pairs.fq")
    genome = os.path.join(GOLDEN, "golden_genome.fa")
    port = 9000 + (os.getpid() + 7) % 20000
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "shrimp_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", out, "--block", "20",
             "--", "-Q", "-p", "opp-in", reads, genome],
            cwd=ROOT, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=1200)
        assert p.returncode == 0, err.decode()[-2000:]

    with open(os.path.join(GOLDEN, "golden_paired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want))


def test_two_process_two_genome_shards(tmp_path):
    """The full reads x genome grid: 2 jax.distributed processes each
    mapping their read share across 2 genome shards on the mesh
    (--genome-shards through the delegated CLI) — assembled output
    equals the whole single-process, single-index run."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4")
    out = str(tmp_path / "grid.sam")
    reads = os.path.join(GOLDEN, "golden_reads.fq")
    genome = os.path.join(GOLDEN, "golden_genome.fa")
    port = 9000 + (os.getpid() + 13) % 20000
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "shrimp_tpu.parallel.multihost",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--out", out, "--block", "50",
             "--", "-Q", "--genome-shards", "2", reads, genome],
            cwd=ROOT, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=1200)
        assert p.returncode == 0, err.decode()[-2000:]

    with open(os.path.join(GOLDEN, "golden_unpaired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@")]
    got = body(out)
    assert got == want, (len(got), len(want))

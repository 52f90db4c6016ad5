"""Local-alignment and ungapped modes: byte parity with the reference."""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "shrimp_tpu.gmapper"] + args,
        capture_output=True, text=True, cwd=ROOT)


def body(stdout):
    return [l for l in stdout.splitlines() if not l.startswith("@")]


def golden(name):
    with open(os.path.join(GOLDEN, name)) as fh:
        return [l.rstrip("\n") for l in fh]


def test_local_mode():
    """--local disables MQVs (gmapper.c:2323-2326) and flips to local DP."""
    r = run_cli(["--mode", "ls", "-Q", "--local",
                 os.path.join(GOLDEN, "mini_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden("golden_local.sam")


def test_ungapped_mode():
    """-U implies gapless pass1, -255 gap opens, no anchors
    (gmapper.c:2055-2060)."""
    r = run_cli(["--mode", "ls", "-Q", "-U", "--local",
                 os.path.join(GOLDEN, "mini_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden("golden_ungapped.sam")


def test_ungapped_needs_local():
    r = run_cli(["--mode", "ls", "-Q", "-U",
                 os.path.join(GOLDEN, "mini_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 1
    assert "ungapped" in r.stderr


def test_invalid_match_mode():
    r = run_cli(["--mode", "ls", "-Q", "-n", "3",
                 os.path.join(GOLDEN, "mini_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 1
    assert "invalid match mode" in r.stderr

"""Local-alignment and ungapped modes: byte parity with the reference."""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run_cli(args):
    from cli_helper import run_gmapper
    return run_gmapper(args, cwd=ROOT)


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


def test_threshold_flags():
    """-r/-v/-h user thresholds reach the funnel (advisor high finding);
    byte parity vs reference for pct and absolute forms."""
    for flags, gold in ((["-h", "80%"], "golden_h80.sam"),
                        (["-r", "80%"], "golden_r80.sam"),
                        (["-h", "1200"], "golden_habs.sam")):
        r = run_cli(["--mode", "ls", "-Q"] + flags +
                    [os.path.join(GOLDEN, "golden_reads.fq"),
                     os.path.join(GOLDEN, "golden_genome.fa")])
        assert r.returncode == 0, r.stderr
        assert body(r.stdout) == golden(gold), flags


def test_mirna_mode():
    """-M mirna applies the full set_mode_from_string bundle
    (gmapper.c:1495-1516); byte parity vs reference."""
    r = run_cli(["--mode", "ls", "-Q", "-M", "mirna",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden("golden_mirna.sam")


def test_mode_ls_cs_rejected():
    """-M only accepts mirna (gmapper.c:2119-2129)."""
    r = run_cli(["--mode", "ls", "-Q", "-M", "cs",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 1
    assert "unrecognized mode" in r.stderr


def test_trim_selector_unpaired_rejected():
    """--trim-first/--trim-second error in unpaired mode (gmapper.c:2352)."""
    r = run_cli(["--mode", "ls", "-Q", "--trim-front", "3", "--trim-first",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 1
    assert "trim-first" in r.stderr


def test_cs_gapless_modes():
    """CS -M mirna and -U run the dedicated gapless diagonal kernel
    (sw-gapless.c:58 incl. the forced-first-colour rule); byte parity."""
    for flags, gold in (((["-M", "mirna"]), "golden_cs_mirna.sam"),
                        ((["-U", "--local"]), "golden_cs_ungapped.sam")):
        r = run_cli(["--mode", "cs", "-Q"] + flags +
                    [os.path.join(GOLDEN, "golden_reads_cs.fq"),
                     os.path.join(GOLDEN, "golden_genome.fa")])
        assert r.returncode == 0, r.stderr
        assert body(r.stdout) == golden(gold), flags

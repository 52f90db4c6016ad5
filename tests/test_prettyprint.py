"""prettyprint tool + gmapper -P parity with the reference binaries."""

import os

from cli_helper import run_module

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run(mod, args):
    return run_module(mod, args, cwd=ROOT)


def test_prettyprint_ls():
    r = run("shrimp_tpu.tools.prettyprint",
            [os.path.join(GOLDEN, "legacy_tiny.out"),
             os.path.join(GOLDEN, "golden_genome.fa"),
             os.path.join(GOLDEN, "mini_reads.fa")])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_prettyprint_ls.out")) as fh:
        assert r.stdout == fh.read()


def test_prettyprint_cs():
    r = run("shrimp_tpu.tools.prettyprint",
            ["--mode", "cs",
             os.path.join(GOLDEN, "legacy_cs_tiny.out"),
             os.path.join(GOLDEN, "golden_genome.fa"),
             os.path.join(GOLDEN, "mini_reads_cs.fa")])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_prettyprint_cs.out")) as fh:
        assert r.stdout == fh.read()


def test_gmapper_pretty_flag():
    r = run("shrimp_tpu.gmapper",
            ["--mode", "ls", "-Q", "--shrimp-format", "-P",
             os.path.join(GOLDEN, "mini_reads.fq"),
             os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_legacy_pretty.out")) as fh:
        assert r.stdout == fh.read()

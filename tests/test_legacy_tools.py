"""Parity tests for the legacy-format downstream tools (shrimp2sam,
shrimp_var, probcalc) against outputs of the reference binaries on
tests/golden/legacy_mini.out (gmapper --shrimp-format on the mini corpus)."""

import os

from cli_helper import run_module

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))
LEGACY = os.path.join(GOLDEN, "legacy_mini.out")


def run_tool(mod, args):
    return run_module(f"shrimp_tpu.tools.{mod}", args, cwd=ROOT)


def test_shrimp_var_parity():
    r = run_tool("shrimp_var", ["-r", LEGACY])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_shrimpvar.out")) as fh:
        assert r.stdout == fh.read()


def test_shrimp2sam_parity():
    r = run_tool("shrimp2sam", [
        LEGACY, os.path.join(GOLDEN, "mini_reads.fq"),
        os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    mine = [l for l in r.stdout.splitlines() if not l.startswith("@PG")]
    with open(os.path.join(GOLDEN, "golden_shrimp2sam.sam")) as fh:
        want = [l.rstrip("\n") for l in fh if not l.startswith("@PG")]
    assert mine == want


def test_probcalc_parity():
    r = run_tool("probcalc", ["50000", LEGACY])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_probcalc.out")) as fh:
        assert r.stdout == fh.read()


def test_probcalc_sort_top():
    r = run_tool("probcalc", ["-s", "normodds", "-t", "2", "50000", LEGACY])
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_probcalc_normodds.out")) as fh:
        assert r.stdout == fh.read()

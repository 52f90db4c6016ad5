"""probcalc_mp parity with the reference binary on a colinear mate-pair
scenario (gmapper --shrimp-format -> probcalc -> sort -> probcalc_mp)."""

import os

from cli_helper import run_module

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def test_probcalc_mp_parity():
    r = run_module(
        "shrimp_tpu.tools.probcalc_mp",
        ["-m", os.path.join(GOLDEN, "mp_pc_sorted.out"),
         "-f", "_F", "-b", "_R", "-g", "50000", "-M", "400",
         "-L", "0", "-G", "0.0", "-C", "1.0"], cwd=ROOT)
    assert r.returncode == 0, r.stderr
    with open(os.path.join(GOLDEN, "golden_probcalc_mp.out")) as fh:
        assert r.stdout == fh.read()

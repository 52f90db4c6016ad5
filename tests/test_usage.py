"""Exact usage() text parity (gmapper.c:1009-1246).

Goldens are the reference binary's stderr minus its build banner:
  gmapper-ls -?            -> golden_usage_ls_full.txt   (exit 1)
  gmapper-ls  (no args)    -> golden_usage_ls_short.txt  (incl. the
                              "error: reads_file, ..." line, exit 1)
  gmapper-cs -?            -> golden_usage_cs_full.txt
"""

import os

from cli_helper import run_gmapper

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def _usage_lines(stderr: str):
    lines = stderr.splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("error:") or ln.startswith("usage:"):
            return lines[i:]
    return lines


def _golden(name):
    with open(os.path.join(GOLDEN, name)) as fh:
        return [l.rstrip("\n") for l in fh]


def _check(args, golden):
    r = run_gmapper(args, cwd=ROOT)
    assert r.returncode == 1
    got = _usage_lines(r.stderr)
    want = _golden(golden)
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)


def test_usage_full_ls():
    _check(["--mode", "ls", "-?"], "golden_usage_ls_full.txt")


def test_usage_full_cs():
    _check(["--mode", "cs", "-?"], "golden_usage_cs_full.txt")


def test_usage_short_no_args():
    _check(["--mode", "ls"], "golden_usage_ls_short.txt")

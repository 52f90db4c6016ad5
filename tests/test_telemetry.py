"""Settings echo + statistics block: format parity with the reference
(print_settings gmapper.c:1348-1443, print_statistics :695-1009), with
timing-dependent values masked.

Golden stderr files were captured from the reference binary
(/tmp/refbuild per tests/golden/gen_golden.sh); regenerate with:
  gmapper-ls -Q -D golden_reads.fq golden_genome.fa -N 1 2> golden_stderr_D.txt
"""

import os
import re
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))


def run_cli(args):
    from cli_helper import run_gmapper
    return run_gmapper(args, cwd=ROOT)


TIMING = re.compile(
    r"(Time:|Run-time:|per hour:|per core-hour:|Cells per Second:"
    r"|Thread \d|thrd:\d|Genomemap:)")


def mask(text: str, section_start: str, section_end: str | None = None):
    """Extract a stderr section with timing-dependent values masked."""
    lines = []
    on = False
    for ln in text.splitlines():
        if ln.startswith(section_start):
            on = True
        if on and section_end and ln.startswith(section_end):
            break
        if not on:
            continue
        if TIMING.search(ln):
            lines.append(re.sub(r"[\d,.]+", "#", ln))
        else:
            lines.append(ln)
    return lines


def golden_stderr(name):
    with open(os.path.join(GOLDEN, name)) as fh:
        return fh.read()


def test_settings_echo_parity():
    r = run_cli(["--mode", "ls", "-Q", "-D",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    ref = golden_stderr("golden_stderr_D.txt")
    want = mask(ref, "Settings:", "- Processing")
    got = mask(r.stderr, "Settings:", "- Processing")
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in zip(want, got) if w != g)


def test_statistics_block_parity():
    """Statistics block line-for-line vs the reference, timing values and
    the per-thread/memory lines masked.  The reference additionally prints
    a thrd: aggregate line and my-alloc leak-report lines we don't
    replicate — those are filtered."""
    r = run_cli(["--mode", "ls", "-Q", "-D",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    ref = golden_stderr("golden_stderr_D.txt")

    def stats_lines(text):
        out = []
        skip_tpu = 0
        for ln in mask(text, "Statistics:"):
            if ln.lstrip().startswith("TPU Engine Choices:"):
                # our -D adds a TPU-specific diagnostics block (auto-tune
                # verdicts + fallback counters) the reference cannot have
                skip_tpu = 5
                continue
            if skip_tpu:
                skip_tpu -= 1
                continue
            if ln.startswith(("thrd:", "crt_mem:", "mem_")):
                continue
            if TIMING.search(ln) or ln.lstrip().startswith("Thread"):
                continue
            out.append(ln)
        return out

    want = stats_lines(ref)
    got = stats_lines(r.stderr)
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)


def test_insert_histogram_format():
    """-X paired: the exact [lo-hi]: pct%% histogram (gmapper.c:670-679)."""
    r = run_cli(["--mode", "ls", "-Q", "-X", "-p", "opp-in", "-I", "0,500",
                 os.path.join(GOLDEN, "golden_pairs.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    hist = [ln for ln in r.stderr.splitlines()
            if re.match(r"\[\d+-\d+\]: [\d.]+%$", ln)]
    assert len(hist) == 100
    assert hist[0].startswith("[0-5]:")   # bucket size ceil(501/100) = 6


def test_insert_histogram_unpaired_warns():
    r = run_cli(["--mode", "ls", "-Q", "-X",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0
    assert "insert histogram not available in unpaired mode" in r.stderr


def test_genomemap_stats_parity():
    """-Y: exact print_genomemap_stats format (genome.c:834-903).

    Golden captured from the reference:
      gmapper-ls -N 1 -Y -Q golden_reads.fq golden_genome.fa
    """
    r = run_cli(["--mode", "ls", "-N", "1", "-Y", "-Q",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    lines = r.stderr.splitlines()
    start = lines.index("Genome Map stats:")
    got = lines[start:]
    end = 1
    while end < len(got) and re.match(r"(sn:\d|\[\d)", got[end]):
        end += 1
    got = got[:end]
    want = golden_stderr("golden_Y.txt").splitlines()
    assert got == want, "\n".join(
        f"{w!r} != {g!r}" for w, g in
        zip(want + [""] * len(got), got + [""] * len(want)) if w != g)

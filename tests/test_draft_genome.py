"""Scaffold-heavy draft genome (5,000 tiny contigs): paired mapping must be
byte-exact vs the reference — exercises the dynamic pair-up key packing
(paired.py: cn/g_off/rid bit budget) that replaced the 1024-contig cap."""

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(__file__))
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def make_corpus(tmp):
    rng = np.random.default_rng(42)
    code = "ACGT"
    contigs = []
    gpath = os.path.join(tmp, "draft_genome.fa")
    rpath = os.path.join(tmp, "draft_pairs.fq")
    with open(gpath, "w") as fh:
        for i in range(5000):
            L = int(rng.integers(400, 1200))
            seq = "".join(code[b] for b in rng.integers(0, 4, L))
            contigs.append(seq)
            fh.write(f">scaf{i:05d}\n")
            for j in range(0, L, 80):
                fh.write(seq[j:j + 80] + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    with open(rpath, "w") as fh:
        n = 0
        for i in range(300):
            ci = int(rng.integers(0, 5000))
            seq = contigs[ci]
            if len(seq) < 260:
                continue
            p = int(rng.integers(0, len(seq) - 250))
            isz = int(rng.integers(150, 250))
            r1 = seq[p:p + 50]
            r2 = seq[p + isz - 50:p + isz].translate(comp)[::-1]
            fh.write(f"@dp{n:04d}\n{r1}\n+\n{'Z' * 50}\n"
                     f"@dp{n:04d}\n{r2}\n+\n{'Z' * 50}\n")
            n += 1
    return gpath, rpath


def test_draft_genome_paired(tmp_path):
    gpath, rpath = make_corpus(str(tmp_path))
    from cli_helper import run_gmapper
    r = run_gmapper(["-Q", "-p", "opp-in", "-I", "0,500", rpath, gpath],
                    cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    got = [l for l in r.stdout.splitlines() if not l.startswith("@")]
    with open(os.path.join(GOLDEN, "golden_draft_paired.sam")) as fh:
        want = [l.rstrip("\n") for l in fh]
    assert got == want, (len(got), len(want))

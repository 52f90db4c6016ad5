#!/usr/bin/env python3
"""Same-host reference baseline (VERDICT r2 #2 + #7).

Builds nothing itself: point SHRIMP_REF_GMAPPER at an -O3 build of the
reference gmapper-ls (e.g. `cp -r /root/reference /tmp/refbuild && make
-C /tmp/refbuild bin/gmapper`), export the bench corpus, run the binary
on the exact 1 Gbp bench condition, and record:

  - reads/s from the reference's own "Read Mapping Time" stat (index
    load/build excluded on BOTH sides: bench.py also excludes it)
  - top-hit precision/recall against the generator truth (same +-8 bp
    criterion as bench.py)
  - pass-1 windows/read = Vector SW invocations / reads (VERDICT #7:
    compare against our funnel's f1 invocations on the same corpus)

Writes benchmarks/reference_samehost.json; bench.py picks it up and
emits `vs_samehost` next to `vs_baseline` when the host matches.

Usage: python benchmarks/run_reference_samehost.py [n_reads]
"""
import json
import os
import platform
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

GMAPPER = os.environ.get("SHRIMP_REF_GMAPPER", "/tmp/refbuild/bin/gmapper-ls")
CORPUS = os.environ.get("SHRIMP_BENCH_CORPUS", "/tmp/bench_corpus")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "reference_samehost.json")


def cpu_model():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def stat(stderr, label, after=None):
    hay = stderr
    if after is not None:
        i = stderr.find(after)
        if i < 0:
            return None
        hay = stderr[i:]
    m = re.search(re.escape(label) + r"\s*([\d,.]+)", hay)
    return float(m.group(1).replace(",", "")) if m else None


def sam_top_hits(path):
    """First (highest-scoring, reference emits best-first) hit per qname,
    as (rname, 1-based pos)."""
    top = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fld = line.split("\t", 5)
            qname, flag, rname, pos = fld[0], int(fld[1]), fld[2], int(fld[3])
            if flag & 0x4 or qname in top:
                continue
            top[qname] = (rname, pos)
    return top


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else bench.N_READS
    assert os.path.exists(GMAPPER), f"build the reference first: {GMAPPER}"

    gpath = os.path.join(CORPUS, "genome.fa")
    rpath = os.path.join(CORPUS, "reads.fq")
    if not (os.path.exists(gpath) and os.path.exists(rpath)):
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "export_bench_corpus.py"), CORPUS],
                       check=True)
    truth = np.load(os.path.join(CORPUS, "truth.npy"))
    if n_reads < bench.N_READS:
        # keep the first n_reads records of the fastq
        sub = os.path.join(CORPUS, f"reads_{n_reads}.fq")
        if not os.path.exists(sub):
            with open(rpath) as f, open(sub, "w") as g:
                for _ in range(n_reads * 4):
                    g.write(f.readline())
        rpath = sub

    sam = os.path.join(CORPUS, "ref_out.sam")
    errf = os.path.join(CORPUS, "ref_out.stderr")
    cmd = [GMAPPER, "-N", "1", "-E", rpath, gpath]
    sys.stderr.write("+ " + " ".join(cmd) + "\n")
    t0 = time.time()
    with open(sam, "w") as so, open(errf, "w") as se:
        subprocess.run(cmd, stdout=so, stderr=se, check=True,
                       timeout=4 * 3600)
    wall = time.time() - t0
    stderr = open(errf).read()

    map_secs = stat(stderr, "Read Mapping Time:")
    load_secs = stat(stderr, "Load Genome Time:")
    f1_invocs = stat(stderr, "Invocations:", after="Vector Smith-Waterman")
    reads_matched = stat(stderr, "Reads Matched:")

    # global truth offsets -> (contig, local) via the cached index
    idx, _, cached = bench.build_or_load_index()
    assert cached
    offs = {idx.contig_names[c]: int(idx.contig_offsets[c])
            for c in range(idx.num_contigs)}

    top = sam_top_hits(sam)
    n_correct = 0
    for ri in range(n_reads):
        hit = top.get(f"r{ri:05d}")
        if hit is None:
            continue
        rname, pos = hit
        gpos = offs[rname] + (pos - 1)
        if abs(gpos - int(truth[ri])) <= 8:
            n_correct += 1
    n_matched = len(top)

    rec = {
        "binary": GMAPPER,
        "build": "-O3 -DNDEBUG (no ASAN)",
        "cpu": cpu_model(),
        "genome_bp": bench.GENOME_BP,
        "n_reads": n_reads,
        "wall_secs": round(wall, 1),
        "load_genome_secs": load_secs,
        "map_secs": map_secs,
        "reads_per_sec": round(n_reads / map_secs, 1) if map_secs else None,
        "matched_frac": round(n_matched / n_reads, 4),
        "recall_top_hit": round(n_correct / n_reads, 4),
        "precision_top_hit": round(n_correct / max(n_matched, 1), 4),
        "f1_invocs": f1_invocs,
        "windows_per_read": round(f1_invocs / n_reads, 1) if f1_invocs else None,
        "reads_matched_stat": reads_matched,
        "cmd": " ".join(cmd),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

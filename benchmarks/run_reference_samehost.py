#!/usr/bin/env python3
"""Same-host reference baselines for EVERY grid row (VERDICT r4 #1/#2).

Runs the -O3 reference binary on the exact bench corpora and records,
per mode, the reference's own "Read Mapping Time" stat (index load/build
excluded on BOTH sides), precision/recall against the generator truth,
and the pass-1 windows/read counter:

    python benchmarks/run_reference_samehost.py unpaired [n_reads]
    python benchmarks/run_reference_samehost.py paired
    python benchmarks/run_reference_samehost.py cs

Point SHRIMP_REF_GMAPPER / SHRIMP_REF_GMAPPER_CS at -O3 builds of
gmapper-ls / gmapper-cs (e.g. `make -C /tmp/refbuild bin/gmapper`), and
(optionally) SHRIMP_REF_INDEX_LS / SHRIMP_REF_INDEX_CS at `-S`-saved
index prefixes so repeat runs skip the ~46-min projection build.  Run
with SHRIMP_BENCH_GBP=3.1 and SHRIMP_BENCH_CORPUS=<dir> for the
hg18-scale condition (writes the _3g1-suffixed record).

Outputs: benchmarks/reference_samehost.json (unpaired 1 Gbp),
reference_samehost_paired.json, reference_samehost_cs.json,
reference_samehost_3g1.json; bench.py / bench_grid.py pick these up and
emit `vs_samehost` next to `vs_baseline`.
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
GMAPPER_CS = os.environ.get("SHRIMP_REF_GMAPPER_CS",
                            "/tmp/refbuild/bin/gmapper-cs")
CORPUS = os.environ.get("SHRIMP_BENCH_CORPUS", "/tmp/bench_corpus")
IDX_LS = os.environ.get("SHRIMP_REF_INDEX_LS", "/tmp/refidx/ls1g")
IDX_CS = os.environ.get("SHRIMP_REF_INDEX_CS", "/tmp/refidx/cs1g")
HERE = os.path.dirname(os.path.abspath(__file__))


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


def sam_top_hits(path, mate1_only=False):
    """First (highest-scoring, reference emits best-first) mapped hit per
    qname as (rname, 1-based pos, proper_pair).  mate1_only keeps only
    records with flag 0x40 (paired runs: score the pair by mate 1)."""
    top = {}
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fld = line.split("\t", 5)
            qname, flag, rname, pos = fld[0], int(fld[1]), fld[2], int(fld[3])
            if flag & 0x4 or qname in top:
                continue
            if mate1_only and not flag & 0x40:
                continue
            top[qname] = (rname, pos, bool(flag & 0x2))
    return top


def contig_offsets():
    idx, _, cached = bench.build_or_load_index()
    assert cached, "run bench.py once to build the bench index cache"
    return ({idx.contig_names[c]: int(idx.contig_offsets[c])
             for c in range(idx.num_contigs)}, idx)


def run_binary(cmd, sam, errf):
    sys.stderr.write("+ " + " ".join(cmd) + "\n")
    t0 = time.time()
    with open(sam, "w") as so, open(errf, "w") as se:
        subprocess.run(cmd, stdout=so, stderr=se, check=True,
                       timeout=6 * 3600)
    return time.time() - t0


def base_record(cmd, wall, stderr, n_reads):
    map_secs = stat(stderr, "Read Mapping Time:")
    return {
        "build": "-O3 -DNDEBUG (no ASAN)",
        "cpu": cpu_model(),
        "genome_bp": bench.GENOME_BP,
        "n_reads": n_reads,
        "wall_secs": round(wall, 1),
        "load_genome_secs": stat(stderr, "Load Genome Time:"),
        "map_secs": map_secs,
        "reads_per_sec": (round(n_reads / map_secs, 1) if map_secs
                          else None),
        "f1_invocs": stat(stderr, "Invocations:",
                          after="Vector Smith-Waterman"),
        "reads_matched_stat": stat(stderr, "Reads Matched:"),
        "cmd": " ".join(cmd),
    }


def index_args(prefix, fallback_genome):
    if os.path.exists(prefix + ".genome"):
        return ["-L", prefix]
    return [fallback_genome]


def finish(rec, out_name):
    out = os.path.join(HERE, out_name)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec))


def run_unpaired(n_reads):
    gpath = os.path.join(CORPUS, "genome.fa")
    rpath = os.path.join(CORPUS, "reads.fq")
    truth = np.load(os.path.join(CORPUS, "truth.npy"))
    if n_reads < bench.N_READS:
        sub = os.path.join(CORPUS, f"reads_{n_reads}.fq")
        if not os.path.exists(sub):
            with open(rpath) as f, open(sub, "w") as g:
                for _ in range(n_reads * 4):
                    g.write(f.readline())
        rpath = sub
    sam = os.path.join(CORPUS, "ref_out.sam")
    errf = os.path.join(CORPUS, "ref_out.stderr")
    cmd = [GMAPPER, "-N", "1", "-E", rpath] + index_args(IDX_LS, gpath)
    wall = run_binary(cmd, sam, errf)
    stderr = open(errf).read()
    rec = {"binary": GMAPPER, **base_record(cmd, wall, stderr, n_reads)}

    offs, _ = contig_offsets()
    top = sam_top_hits(sam)
    n_correct = 0
    for ri in range(n_reads):
        hit = top.get(f"r{ri:05d}")
        if hit and abs(offs[hit[0]] + hit[1] - 1 - int(truth[ri])) <= 8:
            n_correct += 1
    rec.update({
        "matched_frac": round(len(top) / n_reads, 4),
        "recall_top_hit": round(n_correct / n_reads, 4),
        "precision_top_hit": round(n_correct / max(len(top), 1), 4),
        "windows_per_read": (round(rec["f1_invocs"] / n_reads, 1)
                             if rec["f1_invocs"] else None),
    })
    suffix = "" if bench.GENOME_BP == 10**9 else "_3g1"
    finish(rec, f"reference_samehost{suffix}.json")


def run_paired():
    gpath = os.path.join(CORPUS, "genome.fa")
    r1 = os.path.join(CORPUS, "reads_1.fq")
    r2 = os.path.join(CORPUS, "reads_2.fq")
    truth = np.load(os.path.join(CORPUS, "truth_pairs.npy"))
    n_pairs = len(truth)
    sam = os.path.join(CORPUS, "ref_out_paired.sam")
    errf = os.path.join(CORPUS, "ref_out_paired.stderr")
    # same condition as benchmarks/bench_grid.py run_paired
    cmd = [GMAPPER, "-N", "1", "-E", "-p", "opp-in", "-I", "50,600",
           "-1", r1, "-2", r2] + index_args(IDX_LS, gpath)
    wall = run_binary(cmd, sam, errf)
    stderr = open(errf).read()
    rec = {"binary": GMAPPER, "mode": "paired",
           **base_record(cmd, wall, stderr, 2 * n_pairs)}
    rec["n_pairs"] = n_pairs
    # reads/s on the READS basis (2 reads per pair), comparable to the
    # paired grid row's value = 2 * n_pairs / map_secs
    offs, _ = contig_offsets()
    top = sam_top_hits(sam, mate1_only=True)
    n_correct = n_proper = 0
    for pi in range(n_pairs):
        hit = top.get(f"p{pi:05d}")
        if hit is None:
            continue
        rname, pos, proper = hit
        n_proper += proper
        if abs(offs[rname] + pos - 1 - int(truth[pi])) <= 8:
            n_correct += 1
    rec.update({
        "pairs_matched_frac": round(n_proper / n_pairs, 4),
        "recall_top_pair": round(n_correct / n_pairs, 4),
        "windows_per_read": (round(rec["f1_invocs"] / (2 * n_pairs), 1)
                             if rec["f1_invocs"] else None),
    })
    finish(rec, "reference_samehost_paired.json")


def run_cs():
    gpath = os.path.join(CORPUS, "genome.fa")
    rpath = os.path.join(CORPUS, "reads_cs.fq")
    truth = np.load(os.path.join(CORPUS, "truth_cs.npy"))
    n_reads = len(truth)
    sam = os.path.join(CORPUS, "ref_out_cs.sam")
    errf = os.path.join(CORPUS, "ref_out_cs.stderr")
    cmd = [GMAPPER_CS, "-N", "1", "-E", rpath] + index_args(IDX_CS, gpath)
    wall = run_binary(cmd, sam, errf)
    stderr = open(errf).read()
    rec = {"binary": GMAPPER_CS, "mode": "cs",
           **base_record(cmd, wall, stderr, n_reads)}
    offs, _ = contig_offsets()
    top = sam_top_hits(sam)
    n_correct = 0
    for ri in range(n_reads):
        hit = top.get(f"c{ri:05d}")
        if hit and abs(offs[hit[0]] + hit[1] - 1 - int(truth[ri])) <= 8:
            n_correct += 1
    rec.update({
        "matched_frac": round(len(top) / n_reads, 4),
        "recall_top_hit": round(n_correct / n_reads, 4),
        "precision_top_hit": round(n_correct / max(len(top), 1), 4),
        "windows_per_read": (round(rec["f1_invocs"] / n_reads, 1)
                             if rec["f1_invocs"] else None),
    })
    finish(rec, "reference_samehost_cs.json")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "unpaired"
    if mode.isdigit():                      # legacy: bare n_reads arg
        mode, n = "unpaired", int(sys.argv[1])
    else:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else bench.N_READS
    binary = GMAPPER_CS if mode == "cs" else GMAPPER
    assert os.path.exists(binary), f"build the reference first: {binary}"
    if mode == "unpaired":
        run_unpaired(n)
    elif mode == "paired":
        run_paired()
    elif mode == "cs":
        run_cs()
    else:
        raise SystemExit(f"unknown mode {mode}; use unpaired|paired|cs")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Export the bench corpus (cached 1 Gbp index + the exact bench reads)
to FASTA/FASTQ so the reference binary can run the same condition
(VERDICT r2 task 2: same-host reference baseline).

Usage: python benchmarks/export_bench_corpus.py OUTDIR
Writes OUTDIR/genome.fa and OUTDIR/reads.fq (+ truth.npy).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from shrimp_tpu import dna


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    idx, _, cached = bench.build_or_load_index()
    assert cached, "build the bench index first (run bench.py once)"

    gpath = os.path.join(outdir, "genome.fa")
    if not os.path.exists(gpath):
        lut = np.frombuffer(b"ACGT", np.uint8)
        with open(gpath, "wb") as f:
            for c in range(idx.num_contigs):
                lo = int(idx.contig_offsets[c])
                n = int(idx.contig_len[c])
                f.write(f">{idx.contig_names[c]}\n".encode())
                codes = idx.genome[lo:lo + n]
                # vectorized 60-col line folding: reshape into rows and
                # append a newline column
                step = 60 * 200_000
                for s in range(0, n, step):
                    blk = lut[codes[s:s + step]]
                    rows = len(blk) // 60
                    body = np.empty((rows, 61), np.uint8)
                    body[:, :60] = blk[:rows * 60].reshape(rows, 60)
                    body[:, 60] = ord("\n")
                    f.write(body.tobytes())
                    rem = blk[rows * 60:]
                    if len(rem):
                        f.write(rem.tobytes() + b"\n")
        sys.stderr.write(f"wrote {gpath}\n")

    rng = np.random.default_rng(7)
    reads, truth = bench.make_reads(idx, rng, bench.N_READS)
    rpath = os.path.join(outdir, "reads.fq")
    with open(rpath, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")
    np.save(os.path.join(outdir, "truth.npy"), truth)
    sys.stderr.write(f"wrote {rpath} ({len(reads)} reads)\n")

    # paired + colour-space rows of the grid (same generators as
    # benchmarks/bench_grid.py, same seeds -> identical FASTQ bytes on
    # both sides of the same-host comparison)
    import bench_grid
    pairs, ptruth = bench_grid.make_pairs(
        idx, np.random.default_rng(17), bench_grid.N_PAIRS)
    for side in (0, 1):
        ppath = os.path.join(outdir, f"reads_{side + 1}.fq")
        with open(ppath, "w") as f:
            for pr in pairs:
                name, seq, qual = pr[side]
                f.write(f"@{name}\n{seq}\n+\n{qual}\n")
    np.save(os.path.join(outdir, "truth_pairs.npy"), ptruth)
    sys.stderr.write(f"wrote reads_1.fq/reads_2.fq ({len(pairs)} pairs)\n")

    cs_reads, cs_truth = bench_grid.make_cs_reads(
        idx, np.random.default_rng(23), bench_grid.N_CS)
    cpath = os.path.join(outdir, "reads_cs.fq")
    with open(cpath, "w") as f:
        for name, seq, qual in cs_reads:
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")
    np.save(os.path.join(outdir, "truth_cs.npy"), cs_truth)
    sys.stderr.write(f"wrote {cpath} ({len(cs_reads)} reads)\n")


if __name__ == "__main__":
    main()

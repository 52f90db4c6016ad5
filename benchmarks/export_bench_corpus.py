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


if __name__ == "__main__":
    main()

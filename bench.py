#!/usr/bin/env python3
"""Benchmark: unpaired letter-space mapping throughput (reads/sec/chip).

Baseline anchor: the reference SHRiMP2 maps ~44 reads/s/core (36bp reads vs
hg18 on a 2011 3GHz core — README:106-108; BASELINE.md).  This bench maps
synthetic 50bp reads (SNP+indel mutated, both strands) against a random 2Mbp
genome and prints one JSON line with reads/sec on the current chip.
"""

import json
import sys
import time

import numpy as np


def make_data(genome_bp=2_000_000, n_reads=16384, read_len=50, seed=7):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_bp).astype(np.int8)
    reads = []
    from shrimp_tpu import dna
    for i in range(n_reads):
        p = rng.integers(0, genome_bp - read_len)
        r = genome[p:p + read_len].copy()
        kind = rng.random()
        if kind < 0.5:
            for _ in range(rng.integers(1, 3)):
                q = rng.integers(0, len(r))
                r[q] = (r[q] + rng.integers(1, 4)) % 4
        elif kind < 0.75:
            r = np.delete(r, rng.integers(5, len(r) - 5))
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append(("r%05d" % i, dna.decode(r), "h" * len(r)))
    return genome, reads


def main():
    from shrimp_tpu import dna, index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    t0 = time.time()
    genome, reads = make_data()
    contig = fastx.Contig(name="chr1", codes=genome)
    idx = gindex.build_index([contig])
    build_secs = time.time() - t0

    mapper = Mapper(idx, MapperConfig(qual_delta=64))

    batch = 4096
    # warmup (JIT compile) at full batch shape
    for _ in mapper.map_stream(iter(reads[:batch * 2]), batch):
        pass

    best_secs = None
    n_done = 0
    n_matched = 0
    for rep in range(3):
        t0 = time.time()
        n_done = 0
        n_matched = 0
        for _, hits in mapper.map_stream(iter(reads), batch):
            n_done += 1
            n_matched += 1 if hits else 0
        secs = time.time() - t0
        best_secs = secs if best_secs is None else min(best_secs, secs)
    secs = best_secs

    rps = n_done / secs
    baseline_rps = 44.0  # reference reads/s/core (BASELINE.md)
    print(json.dumps({
        "metric": "unpaired_reads_per_sec_per_chip",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / baseline_rps, 2),
        "detail": {
            "n_reads": n_done,
            "matched_frac": round(n_matched / n_done, 4),
            "map_secs": round(secs, 2),
            "index_build_secs": round(build_secs, 2),
            "genome_bp": int(len(genome)),
        },
    }))


if __name__ == "__main__":
    main()

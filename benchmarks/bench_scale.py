#!/usr/bin/env python3
"""Production-scale benchmark: 50 Mbp genome, unpaired letter-space.

Exercises the funnel where posting lists are 25x denser than the driver
bench's 2 Mbp genome (region pruning + list capacity behaviour), plus the
native index-builder throughput.  Prints one JSON line.
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    rng_np = np.random.default_rng(11)
    G = 50_000_000
    genome = rng_np.integers(0, 4, size=G).astype(np.int8)
    t0 = time.time()
    idx = gindex.build_index([fastx.Contig(name="chr1", codes=genome)])
    index_secs = time.time() - t0

    m = Mapper(idx, MapperConfig(qual_delta=64))
    rng = random.Random(5)
    code = "ACGT"
    reads = []
    for i in range(8192):
        p = rng.randrange(0, G - 50)
        letters = [int(x) for x in genome[p:p + 50]]
        for _ in range(rng.randint(0, 2)):
            q = rng.randrange(50)
            letters[q] = (letters[q] + rng.randint(1, 3)) % 4
        reads.append((f"r{i}", "".join(code[b] for b in letters), "h" * 50))

    list(m.map_stream(iter(reads[:4096]), batch_size=4096))   # warmup
    best = None
    for _ in range(2):
        t0 = time.time()
        out = list(m.map_stream(iter(reads), batch_size=4096))
        el = time.time() - t0
        best = el if best is None else min(best, el)
    rps = len(reads) / best
    print(json.dumps({
        "metric": "unpaired_reads_per_sec_50Mbp",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / 44.0, 2),
        "detail": {
            "genome_bp": G,
            "index_build_secs": round(index_secs, 1),
            "index_mbp_per_sec": round(G / index_secs / 1e6, 2),
            "matched_frac": sum(1 for _, h in out if h) / len(reads),
        },
    }))


if __name__ == "__main__":
    main()

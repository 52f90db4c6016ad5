#!/usr/bin/env python3
"""Secondary benchmarks: colour-space and paired-end throughput.

(The driver-facing benchmark is /bench.py — unpaired letter space; this
script reports the other two headline modes on the current chip.)
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_genome(bp, seed=11):
    import numpy as np
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=bp).astype(np.int8)


def main():
    import numpy as np

    from shrimp_tpu import dna, index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig
    from shrimp_tpu.pipeline.paired import (PAIR_OPP_IN, PairedConfig,
                                            PairedMapper)

    genome = make_genome(2_000_000)
    contig = fastx.Contig(name="chr1", codes=genome)
    rng = random.Random(5)
    code = "ACGT"

    # ---- colour space ----
    idx_cs = gindex.build_index([contig], colour_space=True)
    cfg = MapperConfig(colour_space=True, params=SWParams.colour_space(),
                       qual_delta=33)
    m = Mapper(idx_cs, cfg)
    reads = []
    for i in range(4096):
        p = rng.randrange(0, len(genome) - 50)
        letters = [int(x) for x in genome[p:p + 50]]
        for _ in range(rng.randint(0, 2)):
            q = rng.randrange(50)
            letters[q] = (letters[q] + rng.randint(1, 3)) % 4
        last = 3
        cs = ["T"]
        for b in letters:
            cs.append(str(b ^ last))
            last = b
        qual = "".join(chr(33 + rng.randint(15, 40)) for _ in range(50))
        reads.append((f"c{i}", "".join(cs), qual))
    m.map_batch(reads[:2048])
    best = None
    for _ in range(3):
        t0 = time.time()
        for i in range(0, len(reads), 2048):
            m.map_batch(reads[i:i + 2048])
        el = time.time() - t0
        best = el if best is None else min(best, el)
    cs_rps = len(reads) / best

    # ---- paired ----
    idx_ls = gindex.build_index([contig])
    pm = PairedMapper(idx_ls, MapperConfig(qual_delta=64),
                      PairedConfig(pair_mode=PAIR_OPP_IN))
    pairs = []
    rc = {0: 3, 1: 2, 2: 1, 3: 0}
    for i in range(2048):
        ins = rng.randint(120, 400)
        p = rng.randrange(0, len(genome) - ins)
        m1 = "".join(code[int(x)] for x in genome[p:p + 50])
        m2 = "".join(code[rc[int(x)]] for x in genome[p + ins - 50:p + ins][::-1])
        pairs.append(((f"p{i}:1", m1, "h" * 50), (f"p{i}:2", m2, "h" * 50)))
    pm.map_pair_batch(pairs[:1024])
    best = None
    for _ in range(3):
        t0 = time.time()
        list(pm.map_pair_stream(iter(pairs), batch_size=1024))
        el = time.time() - t0
        best = el if best is None else min(best, el)
    paired_rps = 2 * len(pairs) / best

    print(json.dumps({
        "cs_reads_per_sec": round(cs_rps, 1),
        "cs_vs_baseline_44rps": round(cs_rps / 44.0, 1),
        "paired_reads_per_sec": round(paired_rps, 1),
        "paired_vs_baseline_88rps": round(paired_rps / 88.0, 1),
    }))


if __name__ == "__main__":
    main()

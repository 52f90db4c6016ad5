#!/usr/bin/env python3
"""The committed benchmark grid at the flagship 1 Gbp condition
(VERDICT r2 #4): paired-end and colour-space throughput on the same
repeat-seeded genome as /bench.py (which covers unpaired LS), each with
precision/recall and the per-stage second breakdown.

    python benchmarks/bench_grid.py paired
    python benchmarks/bench_grid.py cs
    SHRIMP_BENCH_GBP=3.1 python bench.py        # hg18-scale unpaired

Emits one JSON line per run; BENCHMARKS.md carries the recorded values.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

N_PAIRS = 4096
N_CS = 8192
CS_CACHE = bench.CACHE + "_cs"


def load_samehost(suffix):
    """Same-host -O3 reference record for this grid row, if measured
    (benchmarks/run_reference_samehost.py <mode>)."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f"reference_samehost_{suffix}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        rec = json.load(f)
    if rec.get("genome_bp") != bench.GENOME_BP \
            or not rec.get("reads_per_sec"):
        return None
    return rec


def stage_detail(mapper):
    tel = mapper.tel
    return {
        "stage_secs": {k: round(v.secs, 2)
                       for k, v in tel.stages.items() if v.secs > 0.005},
        "pass1_engine": getattr(mapper, "_pass1_engine", None),
        "pass1_path": getattr(mapper, "_pass1_path", None),
        "l3_choice": getattr(mapper, "_l3_choice", None),
        "l3_reason": getattr(mapper, "_l3_reason", None),
        "l3_model": getattr(mapper, "_l3_model", None),
        "vector_sw_cells_per_sec": round(tel.f1.cells_per_sec),
        "scalar_sw_cells_per_sec": round(tel.f2.cells_per_sec),
    }


def make_pairs(idx, rng, n_pairs):
    """Opp-in read pairs, insert 150-450, each mate mutated under the
    unified model (bench.mutate_read: 1 SNP + 1 indel + 4% error —
    VERDICT r4 #8, same as the unpaired row); truth = mate1 start."""
    from shrimp_tpu import dna
    genome = idx.genome
    L = len(genome)
    pairs = []
    truth = []
    for i in range(n_pairs):
        ins = int(rng.integers(150, 450))
        p = int(rng.integers(0, L - ins - 16))
        m1 = bench.mutate_read(genome[p:p + bench.READ_LEN + 6], rng)
        m2 = dna.reverse_complement(bench.mutate_read(
            genome[p + ins - bench.READ_LEN:p + ins + 6], rng))
        pairs.append(((f"p{i:05d}/1", dna.decode(m1), "h" * bench.READ_LEN),
                      (f"p{i:05d}/2", dna.decode(m2), "h" * bench.READ_LEN)))
        truth.append(p)
    return pairs, np.array(truth)


def run_paired():
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig
    from shrimp_tpu.pipeline.paired import (PAIR_OPP_IN, PairedConfig,
                                            PairedMapper)

    idx, _, cached = bench.build_or_load_index()
    assert cached, "run bench.py once to build the 1 Gbp index cache"
    pm = PairedMapper(idx, MapperConfig(qual_delta=64),
                      PairedConfig(pair_mode=PAIR_OPP_IN,
                                   min_insert_size=50,
                                   max_insert_size=600))
    pairs, truth = make_pairs(idx, np.random.default_rng(17), N_PAIRS)
    coffs = idx.contig_offsets

    for _ in pm.map_pair_stream(iter(pairs[:1024]), batch_size=1024):
        pass                                   # warm compile + tuning
    from shrimp_tpu.utils import telemetry
    pm.tel = telemetry.Telemetry()

    best = None
    for _ in range(2):
        t0 = time.time()
        n_pairs_matched = n_correct = 0
        for pi, pr in enumerate(
                pm.map_pair_stream(iter(pairs), batch_size=1024)):
            # top mate-1 placement: best paired hit, else the half-paired
            # mate-1 hit — the same credit the reference evaluation gives
            # its first non-unmapped 0x40 SAM record
            fh0 = None
            if pr.paired_hits:
                n_pairs_matched += 1
                fh0 = pr.paired_hits[0][0]
            else:
                for side, fh in pr.unpaired_hits:
                    if side == 0:
                        fh0 = fh
                        break
            if fh0 is not None:
                gs0 = fh0.g_off + fh0.genome_start
                if fh0.gen_st == 0:
                    gpos = int(coffs[fh0.cn]) + gs0
                else:
                    clen = int(idx.contig_len[fh0.cn])
                    gpos = int(coffs[fh0.cn]) + (clen - gs0) - fh0.gmapped
                n_correct += abs(gpos - truth[pi]) <= 8
        el = time.time() - t0
        best = el if best is None else min(best, el)

    rps = 2 * N_PAIRS / best
    samehost = load_samehost("paired")
    print(json.dumps({
        "metric": "paired_reads_per_sec_per_chip_1Gbp",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / 88.0, 2),    # 2x44 (README:108)
        "vs_samehost": (round(rps / samehost["reads_per_sec"], 2)
                        if samehost else None),
        "detail": {
            "samehost_ref": (None if samehost is None else {
                "reads_per_sec": samehost["reads_per_sec"],
                "cpu": samehost["cpu"],
                "recall_top_pair": samehost.get("recall_top_pair"),
                "windows_per_read": samehost.get("windows_per_read"),
            }),
            "genome_bp": bench.GENOME_BP,
            "n_pairs": N_PAIRS,
            "map_secs": round(best, 2),
            "pairs_matched_frac": round(n_pairs_matched / N_PAIRS, 4),
            "recall_top_pair": round(n_correct / N_PAIRS, 4),
            **stage_detail(pm),
        },
    }))


def build_or_load_cs_index():
    from shrimp_tpu import index as gindex
    from shrimp_tpu import seeds as seedmod
    from shrimp_tpu.io import fastx

    t0 = time.time()
    if os.path.exists(CS_CACHE + ".mmap.json"):
        return gindex.GenomeIndex.load_mmap(CS_CACHE), time.time() - t0, True
    rng = np.random.default_rng(20260817)      # same genome as bench.py
    chroms = bench.make_genome(rng)
    contigs = [fastx.Contig(name=f"chr{i + 1}", codes=g)
               for i, g in enumerate(chroms)]
    t0 = time.time()
    idx = gindex.build_index(contigs, seedmod.make_seed_set(None),
                             colour_space=True)
    secs = time.time() - t0
    max_w = max(s.weight for s in idx.seed_set.seeds)
    cutoff = max(1000, (100 * idx.total_len) // (4 ** max_w))
    idx.trim(cutoff)
    idx.save_mmap(CS_CACHE)
    sys.stderr.write(f"bench_grid: cs index build {secs:.0f}s\n")
    return idx, secs, False


def make_cs_reads(idx, rng, n_reads):
    """SOLiD-style colour-space reads (T primer + colour digits), letter
    mutations under the unified model (bench.mutate_read — VERDICT r4
    #8) applied before colour encoding; truth recorded."""
    genome = idx.genome
    L = len(genome)
    reads = []
    truth = []
    for i in range(n_reads):
        p = int(rng.integers(0, L - bench.READ_LEN - 16))
        letters = bench.mutate_read(
            genome[p:p + bench.READ_LEN + 6].astype(np.int64), rng)
        last = 3                                 # T primer
        cs = ["T"]
        for b in letters:
            cs.append(str(int(b) ^ last))
            last = int(b)
        qual = "".join(chr(33 + int(rng.integers(15, 41)))
                       for _ in range(bench.READ_LEN))
        reads.append((f"c{i:05d}", "".join(cs), qual))
        truth.append(p)
    return reads, np.array(truth)


def run_cs():
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx, index_secs, cached = build_or_load_cs_index()
    cfg = MapperConfig(colour_space=True, params=SWParams.colour_space(),
                       qual_delta=33)
    mapper = Mapper(idx, cfg)
    reads, truth = make_cs_reads(idx, np.random.default_rng(23), N_CS)
    coffs = idx.contig_offsets

    for _ in mapper.map_stream(iter(reads[:2048]), 2048):
        pass
    from shrimp_tpu.utils import telemetry
    mapper.tel = telemetry.Telemetry()

    best = None
    for _ in range(2):
        t0 = time.time()
        n_matched = n_correct = 0
        for ri, (_, hits) in enumerate(
                mapper.map_stream(iter(reads), 2048)):
            if hits:
                n_matched += 1
                h = hits[0]
                gs0 = h.g_off + h.genome_start
                if h.gen_st == 0:
                    gpos = int(coffs[h.cn]) + gs0
                else:
                    clen = int(idx.contig_len[h.cn])
                    gpos = int(coffs[h.cn]) + (clen - gs0) - h.gmapped
                n_correct += abs(gpos - truth[ri]) <= 8
        el = time.time() - t0
        best = el if best is None else min(best, el)

    rps = N_CS / best
    samehost = load_samehost("cs")
    print(json.dumps({
        "metric": "cs_reads_per_sec_per_chip_1Gbp",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / 44.0, 2),    # README:106-108 (cs!)
        "vs_samehost": (round(rps / samehost["reads_per_sec"], 2)
                        if samehost else None),
        "detail": {
            "samehost_ref": (None if samehost is None else {
                "reads_per_sec": samehost["reads_per_sec"],
                "cpu": samehost["cpu"],
                "recall_top_hit": samehost.get("recall_top_hit"),
                "windows_per_read": samehost.get("windows_per_read"),
            }),
            "genome_bp": bench.GENOME_BP,
            "n_reads": N_CS,
            "map_secs": round(best, 2),
            "matched_frac": round(n_matched / N_CS, 4),
            "recall_top_hit": round(n_correct / N_CS, 4),
            "index_cached": cached,
            **stage_detail(mapper),
        },
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "paired"
    if mode == "paired":
        run_paired()
    elif mode == "cs":
        run_cs()
    else:
        raise SystemExit(f"unknown mode {mode}; use paired|cs")

#!/usr/bin/env python3
"""Stage profile of the 1 Gbp bench condition (run from repo root).

Prints per-stage wall seconds, kernel telemetry, and the tuned path
choices — the judge-reproducible breakdown demanded by VERDICT r2 #3.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx, _, _ = bench.build_or_load_index()
    mapper = Mapper(idx, MapperConfig(qual_delta=64))
    rng = np.random.default_rng(7)
    n = int(os.environ.get("PROF_READS", bench.N_READS))
    reads, truth = bench.make_reads(idx, rng, n)

    for _ in mapper.map_stream(iter(reads[:bench.BATCH * 2]), bench.BATCH):
        pass
    # reset telemetry after warmup
    from shrimp_tpu.utils import telemetry
    mapper.tel = telemetry.Telemetry()

    t0 = time.time()
    n_done = 0
    for _, hits in mapper.map_stream(iter(reads), bench.BATCH):
        n_done += 1
    total = time.time() - t0

    st = {k: round(v.secs, 2) for k, v in mapper.tel.stages.items()}
    ksum = sum(v.secs for v in mapper.tel.stages.values())
    out = {
        "n_reads": n_done,
        "total_secs": round(total, 2),
        "reads_per_sec": round(n_done / total, 1),
        "stage_secs": st,
        "stages_sum": round(ksum, 2),
        "untracked_secs": round(total - ksum, 2),
        "f1": {"invocs": mapper.tel.f1.invocs,
               "cells": mapper.tel.f1.cells,
               "secs": round(mapper.tel.f1.secs, 2)},
        "f2": {"invocs": mapper.tel.f2.invocs,
               "cells": mapper.tel.f2.cells,
               "secs": round(mapper.tel.f2.secs, 2)},
        "pass1_engine": mapper._pass1_engine,
        "pass1_path": mapper._pass1_path,
        "l3_choice": mapper._l3_choice,
        "pass1_windows": mapper.stats["pass1_windows"],
        "pass2_windows": mapper.stats["pass2_windows"],
        "windows_per_read": round(mapper.stats["pass1_windows"] / n_done, 1),
        "device_l3_fallbacks": mapper.stats["device_l3_fallbacks"],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

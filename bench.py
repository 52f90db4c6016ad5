#!/usr/bin/env python3
"""Benchmark: unpaired letter-space mapping at hg18-class scale.

Maps mutated 50bp reads against a 1 Gbp synthetic genome with realistic
repeat structure (Alu-like SINE at ~10% + LINE-like elements at ~7%,
5-15% diverged copies — the heavy-tailed posting lists that make hg18
hard), under the reference's automatic index trimming
(cutoff = max(1000, 100*L/4^w), gmapper.c:2809-2835).

Reports reads/s/chip (the BASELINE.md anchor: 44 reads/s/core for the
reference on a 2011 3GHz core), per-kernel cells/s, and the
precision/recall of mutated-read recovery under the reference's published
sensitivity condition (1 SNP + 1 indel <= 5bp + per-base error;
README:102-104 anchors 94.4%/78.6% for CS reads).

The built index is cached under ~/.cache/shrimp_tpu/ (raw arrays +
memmap), so repeat runs skip the ~7-minute single-core build.
"""

import json
import os
import sys
import time

import numpy as np

_T_START = time.monotonic()
# wall budget for the whole process (driver-run bench is under a timeout;
# round 3's run died building the index cache cold).  Everything after
# the headline JSON line — cache save, second rep — yields to this.
BUDGET = float(os.environ.get("SHRIMP_BENCH_BUDGET", "600"))

# default 1 Gbp; SHRIMP_BENCH_GBP=3.1 runs the full hg18-scale condition
# (the reference's 3.1 Gbp / 48GB-RAM operating point, README:135-150)
GENOME_BP = int(float(os.environ.get("SHRIMP_BENCH_GBP", "1")) * 1e9)
N_READS = 16384
READ_LEN = 50
BATCH = 2048
# cache key carries the exact bp count so nearby sizes never collide
# (the historical names for the two standard sizes are kept)
_CACHE_NAMES = {10**9: "bench1g_v1", 3_100_000_000: "bench3g1_v1"}
CACHE = os.path.join(os.path.expanduser("~"), ".cache", "shrimp_tpu",
                     _CACHE_NAMES.get(GENOME_BP, f"bench{GENOME_BP}bp_v1"))


def make_genome(rng):
    """1 Gbp in 25 chromosomes with interspersed diverged repeats."""
    sine = rng.integers(0, 4, 300).astype(np.int8)       # Alu-like
    line = rng.integers(0, 4, 6000).astype(np.int8)      # LINE-like
    chroms = []
    n_chrom = 25
    clen = GENOME_BP // n_chrom
    for ci in range(n_chrom):
        g = rng.integers(0, 4, clen).astype(np.int8)
        # paste diverged repeat copies: ~10% SINE + ~7% LINE coverage
        # (vectorized: all copies mutated as one matrix, scattered at once)
        for elem, cover in ((sine, 0.10), (line, 0.07)):
            E = len(elem)
            n_copies = int(clen * cover / E)
            pos = rng.integers(0, clen - E, n_copies)
            copies = np.broadcast_to(elem, (n_copies, E)).copy()
            div = (rng.random((n_copies, 1)) * 0.10 + 0.05)
            mut = rng.random((n_copies, E)) < div        # 5-15% divergence
            copies[mut] = (copies[mut]
                           + rng.integers(1, 4, int(mut.sum()))) % 4
            g[pos[:, None] + np.arange(E)[None, :]] = copies
        chroms.append(g)
    return chroms


def build_or_load_index():
    from shrimp_tpu import index as gindex
    from shrimp_tpu import seeds as seedmod
    from shrimp_tpu.io import fastx

    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    t0 = time.time()
    if os.path.exists(CACHE + ".mmap.json"):
        idx = gindex.GenomeIndex.load_mmap(CACHE)
        return idx, time.time() - t0, True
    rng = np.random.default_rng(20260817)
    chroms = make_genome(rng)
    contigs = [fastx.Contig(name=f"chr{i + 1}", codes=g)
               for i, g in enumerate(chroms)]
    gen_secs = time.time() - t0
    t0 = time.time()
    idx = gindex.build_index(contigs, seedmod.make_seed_set(None))
    build_secs = time.time() - t0
    # the reference's automatic mapping-job trim (gmapper.c:2809-2835)
    max_w = max(s.weight for s in idx.seed_set.seeds)
    cutoff = max(1000, (100 * idx.total_len) // (4 ** max_w))
    idx.trim(cutoff)
    sys.stderr.write(f"bench: genome gen {gen_secs:.0f}s, index build "
                     f"{build_secs:.0f}s ({GENOME_BP / 1e6 / build_secs:.1f} "
                     f"Mbp/s single-core), cutoff {cutoff}\n")
    return idx, build_secs, False


def mutate_read(seq_plus, rng, read_len=READ_LEN):
    """The ONE bench mutation model, shared by every grid row
    (unpaired / paired / colour-space — VERDICT r4 #8): 1 SNP +
    1 indel (<=5bp) + 4%% per-base error, applied to a base-code
    slice of >= read_len+5 codes; returns exactly read_len codes."""
    r = seq_plus.copy()
    # 1 SNP
    q = int(rng.integers(0, read_len))
    r[q] = (r[q] + int(rng.integers(1, 4))) % 4
    # 1 indel <= 5bp
    ilen = int(rng.integers(1, 6))
    qi = int(rng.integers(5, read_len - 5))
    if rng.random() < 0.5:
        r = np.delete(r, slice(qi, qi + ilen))
    else:
        ins = rng.integers(0, 4, ilen).astype(r.dtype)
        r = np.insert(r, qi, ins)
    r = r[:read_len]
    # 4% per-base error
    err = rng.random(read_len) < 0.04
    r[err] = (r[err] + rng.integers(1, 4, int(err.sum()))) % 4
    return r


def make_reads(idx, rng, n_reads):
    """Mutated reads under the reference sensitivity condition
    (mutate_read), both strands; truth recorded."""
    from shrimp_tpu import dna
    genome = idx.genome
    L = len(genome)
    reads = []
    truth = []
    for i in range(n_reads):
        p = int(rng.integers(0, L - READ_LEN - 8))
        r = mutate_read(genome[p:p + READ_LEN + 6], rng)
        rc = bool(rng.random() < 0.5)
        if rc:
            r = dna.reverse_complement(r)
        reads.append((f"r{i:05d}", dna.decode(r), "h" * len(r)))
        truth.append(p)
    return reads, np.array(truth)


_POOL_HEALTH = {"tunnel_up_mb_s": None, "tunnel_down_mb_s": None,
                "stalled_probes": 0}


def _wait_pool_healthy():
    """The axon chip pool can wedge for many minutes after an aborted
    transfer (every device op hangs on lease recovery).  Probe with a
    tiny round-trip in a SUBPROCESS under a timeout — a hung in-process
    device call cannot be cancelled — and only start mapping once the
    pool answers, so the timed reps never absorb a recovery stall.

    The probe also times a 4 MB up/down transfer and records it in
    `_POOL_HEALTH` → bench JSON `detail.tunnel_mb_s`, so a run taken on
    a degraded pool is identifiable from its own artifact (observed
    back-to-back variance: 644→466 reads/s tracking tunnel decay;
    BENCHMARKS.md 'Run-to-run variance')."""
    import subprocess
    probe = (
        "import time, numpy, jax\n"
        "d = jax.devices()[0]\n"
        "x = numpy.zeros(4 * 1024 * 1024, numpy.int8)\n"
        "t = time.time(); xd = jax.device_put(x, d)\n"
        "xd.block_until_ready(); up = 4 / max(time.time() - t, 1e-9)\n"
        "t = time.time(); numpy.asarray(xd)\n"
        "down = 4 / max(time.time() - t, 1e-9)\n"
        "print('%.2f %.2f' % (up, down))\n")
    for attempt in range(10):
        if time.monotonic() - _T_START > BUDGET * 0.5:
            sys.stderr.write("bench: pool probe giving up (budget)\n")
            return
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=150,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.DEVNULL, check=True)
            try:
                up, down = map(float, r.stdout.split()[-2:])
                _POOL_HEALTH["tunnel_up_mb_s"] = up
                _POOL_HEALTH["tunnel_down_mb_s"] = down
            except (ValueError, IndexError):
                pass
            _POOL_HEALTH["stalled_probes"] = attempt
            if attempt:
                sys.stderr.write(
                    f"bench: pool healthy after {attempt} stalled "
                    "probes\n")
            return
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError):
            sys.stderr.write("bench: device pool not answering; "
                             "waiting for lease recovery\n")


def main():
    """Wrapper: the devserver TPU tunnel can drop mid-run
    (FailedPrecondition on a transfer); a fresh process re-claims the
    chip cleanly, so on a fatal device error we save the index cache (if
    freshly built) and re-exec, bounded by attempts and the wall budget."""
    attempt = int(os.environ.get("_SHRIMP_BENCH_ATTEMPT", "0"))
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        _wait_pool_healthy()
    try:
        _main()
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        if attempt < 2 and time.monotonic() - _T_START < BUDGET * 0.6:
            if _RESCUE.get("idx") is not None:
                sys.stderr.write("bench: saving index cache before retry\n")
                _RESCUE["idx"].save_mmap(CACHE)
            os.environ["_SHRIMP_BENCH_ATTEMPT"] = str(attempt + 1)
            sys.stderr.write(f"bench: retry {attempt + 1} (re-exec)\n")
            sys.stdout.flush()
            sys.stderr.flush()
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__)])
        raise


_RESCUE: dict = {}


def _main():
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    idx, index_secs, cached = build_or_load_index()
    if not cached:
        _RESCUE["idx"] = idx
    mapper = Mapper(idx, MapperConfig(qual_delta=64,
                                      expected_reads=N_READS))

    rng = np.random.default_rng(7)
    reads, truth = make_reads(idx, rng, N_READS)

    # warmup (JIT compile + auto-tune) at full batch shape
    for _ in mapper.map_stream(iter(reads[:BATCH * 2]), BATCH):
        pass

    coffs = idx.contig_offsets

    def run_once():
        t0 = time.time()
        n_done = n_matched = n_correct = 0
        top_correct = []
        for ri, (_, hits) in enumerate(
                mapper.map_stream(iter(reads), BATCH)):
            n_done += 1
            if hits:
                n_matched += 1
                h = hits[0]
                gs0 = h.g_off + h.genome_start
                if h.gen_st == 0:
                    gpos = int(coffs[h.cn]) + gs0
                else:
                    # SAM POS formula for reverse hits (io/sam.py:171-173)
                    clen = int(idx.contig_len[h.cn])
                    gpos = int(coffs[h.cn]) + (clen - gs0) - h.gmapped
                ok = abs(gpos - truth[ri]) <= 8
                n_correct += ok
        return time.time() - t0, n_done, n_matched, n_correct

    best = None
    for rep in range(2):
        f1_invocs_before = mapper.tel.f1.invocs
        secs, n_done, n_matched, n_correct = run_once()
        best = secs if best is None else min(best, secs)
        # only take the second (cache-warm) rep if it fits the budget
        if time.monotonic() - _T_START + secs * 1.2 > BUDGET:
            break
    f1_invocs_run = int(mapper.tel.f1.invocs - f1_invocs_before)

    rps = n_done / best
    recall = n_correct / n_done
    precision = n_correct / max(n_matched, 1)
    tel = mapper.tel
    baseline_rps = 44.0                     # reference reads/s/core

    # same-host -O3 reference anchor, if recorded
    # (benchmarks/run_reference_samehost.py — VERDICT r2 #2)
    samehost = None
    bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks")
    for name in ("reference_samehost.json", "reference_samehost_3g1.json"):
        sh_path = os.path.join(bdir, name)
        if not os.path.exists(sh_path):
            continue
        with open(sh_path) as f:
            rec = json.load(f)
        if rec.get("genome_bp") == GENOME_BP and rec.get("reads_per_sec"):
            samehost = rec
            break
    print(json.dumps({
        "metric": ("unpaired_reads_per_sec_per_chip_1Gbp"
                   if GENOME_BP == 10**9 else
                   f"unpaired_reads_per_sec_per_chip_{GENOME_BP / 1e9:g}Gbp"),
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / baseline_rps, 2),
        "vs_samehost": (round(rps / samehost["reads_per_sec"], 2)
                        if samehost else None),
        "detail": {
            "stage_secs": {k: round(v.secs, 2)
                           for k, v in tel.stages.items() if v.secs > 0.005},
            "pass1_engine": getattr(mapper, "_pass1_engine", None),
            "pass1_path": getattr(mapper, "_pass1_path", None),
            "l3_choice": getattr(mapper, "_l3_choice", None),
            "l3_reason": getattr(mapper, "_l3_reason", None),
            "l3_model": getattr(mapper, "_l3_model", None),
            "f1_invocs": f1_invocs_run,
            "windows_per_read": round(f1_invocs_run / max(n_done, 1), 1),
            "samehost_ref": (None if samehost is None else {
                "reads_per_sec": samehost["reads_per_sec"],
                "cpu": samehost["cpu"],
                "recall_top_hit": samehost["recall_top_hit"],
                "precision_top_hit": samehost["precision_top_hit"],
                "windows_per_read": samehost["windows_per_read"],
            }),
            "genome_bp": GENOME_BP,
            "n_reads": n_done,
            "map_secs": round(best, 2),
            "matched_frac": round(n_matched / n_done, 4),
            "recall_top_hit": round(recall, 4),
            "precision_top_hit": round(precision, 4),
            "sensitivity_anchor": "reference 94.4%/78.6% (CS, README:102)",
            "index_secs": round(index_secs, 1),
            "index_cached": cached,
            "tunnel_mb_s": {"up": _POOL_HEALTH["tunnel_up_mb_s"],
                            "down": _POOL_HEALTH["tunnel_down_mb_s"],
                            "stalled_probes":
                                _POOL_HEALTH["stalled_probes"]},
            "vector_sw_cells_per_sec": round(tel.f1.cells_per_sec),
            "scalar_sw_cells_per_sec": round(tel.f2.cells_per_sec),
        },
    }), flush=True)

    # persist the index cache only after the headline line is out (a
    # 13 GB write; a driver timeout mid-save must not eat the result —
    # load_mmap keys on .mmap.json, written last, so partials are inert)
    if not cached:
        idx.save_mmap(CACHE)
        sys.stderr.write("bench: index cache saved\n")


if __name__ == "__main__":
    main()

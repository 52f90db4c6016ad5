#!/usr/bin/env python3
"""Kernel-level cells/sec benchmark — the reference's per-engine telemetry
(`print_statistics`, gmapper.c:834-863) as a standalone harness.

Measures every DP engine at production shapes and prints a table plus one
JSON line.  Run on the TPU (default backend) for the real numbers;
`JAX_PLATFORMS=cpu` works for smoke-testing the harness itself.

Engines:
  pass1/scan    anti-diagonal lax.scan vector SW (ops/sw_vector.py)
  pass1/rows    row-scan formulation (ops/sw_vector.py)
  pass1/pallas  Pallas VMEM kernel (ops/sw_vector_pallas.py; TPU only)
  gapless       diagonal cumsum-Kadane (ops/sw_gapless.py)
  pass2/full    full SW + fused traceback (ops/sw_full.py)
  pass2/cs      colour-space 4-layer SW + traceback (ops/sw_full_cs.py)

Reference anchors (same machine, /tmp/refbuild ASAN binary prints
invocations/cells/secs per engine; a non-ASAN -O3 build is ~2-4x faster):
on the round-1 bench host the reference printed ~150-400 Mcells/s for the
SSE2 vector SW and ~10-30 Mcells/s for the scalar full SW per core.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PASS1_B = 8192          # windows in flight per pass-1 call (production)
PASS1_G = 72            # window length: 140% of a 50bp read, padded
PASS1_R = 50
PASS2_B = 512           # pass-2 survivors per call
PASS2_G = 120


def _mk_pass1(rng):
    g = rng.integers(0, 4, (PASS1_B, PASS1_G)).astype(np.int8)
    r = np.empty((PASS1_B, PASS1_R), np.int8)
    # plant homologous reads (8% divergence) so score paths are realistic
    off = rng.integers(0, PASS1_G - PASS1_R, PASS1_B)
    for i in range(PASS1_B):
        r[i] = g[i, off[i]:off[i] + PASS1_R]
    mut = rng.random(r.shape) < 0.08
    r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    return g, r


def _time(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)          # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from shrimp_tpu.ops import sw_vector, sw_gapless, sw_full, sw_full_cs
    from shrimp_tpu.ops.params import SWParams

    backend = jax.default_backend()
    rng = np.random.default_rng(1)
    params = SWParams()
    rows = []

    g, r = _mk_pass1(rng)
    gj, rj = jnp.asarray(g), jnp.asarray(r)
    cells1 = PASS1_B * PASS1_G * PASS1_R

    t = _time(lambda a, b: sw_vector.sw_score_batch(a, b, params),
              gj, rj, reps=args.reps)
    rows.append(("pass1/scan", cells1, t))

    t = _time(lambda a, b: sw_vector.sw_score_batch_rows(a, b, params),
              gj, rj, reps=args.reps)
    rows.append(("pass1/rows", cells1, t))

    if backend != "cpu":
        from shrimp_tpu.ops import sw_vector_pallas
        t = _time(lambda a, b: sw_vector_pallas.sw_score_batch_pallas(
            a, b, params), gj, rj, reps=args.reps)
        rows.append(("pass1/pallas", cells1, t))
        # CS contract: row-0 genome plane (sw-vector.c:111-147)
        g0 = jnp.asarray(rng.integers(0, 4, g.shape).astype(np.int8))
        csp = SWParams.colour_space()
        t = _time(lambda a, b, c: sw_vector.sw_score_batch(
            a, b, csp, genome_row0=c), gj, rj, g0, reps=args.reps)
        rows.append(("pass1cs/scan", cells1, t))
        t = _time(lambda a, b, c: sw_vector_pallas.sw_score_batch_pallas(
            a, b, csp, genome_row0=c), gj, rj, g0, reps=args.reps)
        rows.append(("pass1cs/pallas", cells1, t))

    # gapless: diagonal rows, one row per window
    diag = jnp.asarray(np.concatenate(
        [g[:, :PASS1_R + 8],
         np.full((PASS1_B, 1), sw_gapless.GENOME_PAD, np.int8)], axis=1))
    rrow = jnp.asarray(np.concatenate(
        [r, np.full((PASS1_B, 9), sw_gapless.READ_PAD, np.int8)], axis=1))
    t = _time(lambda a, b: sw_gapless.gapless_score_batch(a, b, params),
              diag, rrow, reps=args.reps)
    rows.append(("gapless", PASS1_B * (PASS1_R + 8), t))

    # pass 2: full SW + traceback on survivor-sized batches
    g2 = rng.integers(0, 4, (PASS2_B, PASS2_G)).astype(np.int8)
    r2 = np.empty((PASS2_B, PASS1_R), np.int8)
    off = rng.integers(0, PASS2_G - PASS1_R, PASS2_B)
    for i in range(PASS2_B):
        r2[i] = g2[i, off[i]:off[i] + PASS1_R]
    mut = rng.random(r2.shape) < 0.08
    r2[mut] = (r2[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    cells2 = PASS2_B * PASS2_G * PASS1_R
    gj2, rj2 = jnp.asarray(g2), jnp.asarray(r2)
    rev = jnp.zeros(PASS2_B, jnp.bool_)
    t = _time(lambda a, b, rv: sw_full.sw_full_and_traceback_jax(
        a, b, rv, params, True), gj2, rj2, rev, reps=args.reps)
    rows.append(("pass2/full+tb", cells2, t))

    # pass 2 CS: 4-layer DP (cells = 4x letter cells)
    qr4 = np.empty((PASS2_B, 4, PASS1_R), np.int8)
    for L in range(4):
        qr4[:, L] = r2
    xover = np.full((PASS2_B, PASS1_R), -14, np.int32)
    t = _time(lambda a, b, c, rv: sw_full_cs.sw_full_cs_and_traceback_jax(
        a, b, c, rv, params, True),
        gj2, jnp.asarray(qr4), jnp.asarray(xover), rev, reps=args.reps)
    rows.append(("pass2/cs+tb", 4 * cells2, t))

    table = {}
    for name, cells, secs in rows:
        mcps = cells / secs / 1e6
        table[name] = round(mcps, 1)
        if not args.json_only:
            print(f"{name:16s} {cells / 1e6:10.1f} Mcells "
                  f"{secs * 1e3:9.2f} ms   {mcps:10.1f} Mcells/s")
    print(json.dumps({"metric": "kernel_mcells_per_sec",
                      "backend": backend,
                      "value": table.get("pass1/pallas",
                                         table.get("pass1/scan")),
                      "unit": "Mcells/s", "detail": table}))


if __name__ == "__main__":
    main()

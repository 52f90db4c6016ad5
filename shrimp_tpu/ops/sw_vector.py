"""Batched score-only Smith-Waterman — the pass-1 filter kernel (L2a).

TPU-native counterpart of the reference's SSE2 anti-diagonal vector SW
(`common/sw-vector.c:68-220`): local affine-gap alignment, score only.
Instead of 8 int16 lanes along one anti-diagonal of one problem, we run a
**batch of (window, read) problems** with the batch in the vector lanes and a
`lax.scan` over anti-diagonals — the same wavefront dependency structure, but
parallelism comes from batching, which is how a 2011-SIMD inner loop maps onto
a 8x128-lane VPU.

Semantics mirrored from the reference:
  * H (nogap) is floored at 0 every cell; score = max over all cells
    (`sw-vector.c:185-199`).
  * Gap states:  A-gap consumes genome (west), B-gap consumes read (north);
    opening costs open+extend (`sw-vector.c:172-179`).
  * Characters "match" iff their 4-bit codes are equal (N==N matches; the
    reference compares raw codes, `sw-vector.c:181-184`).
  * Padding can never match: genome pad = -1, read pad = -2 (the reference's
    "padding must differ" contract, `sw-vector.c:52-59`).

Dtype: int32 accumulators (the reference used int16 and capped scores at
2^15-1, `sw-vector.c:63-67`; int32 is the VPU-native width so we drop the cap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shrimp_tpu.ops.params import SWParams

NEG_INF = -(1 << 28)

GENOME_PAD = -1
READ_PAD = -2


@functools.partial(jax.jit, static_argnames=("params",))
def sw_score_batch(genome: jax.Array, read: jax.Array,
                   params: SWParams = SWParams(),
                   genome_row0: jax.Array | None = None) -> jax.Array:
    """Local affine SW scores for a batch of (genome window, read) pairs.

    Args:
      genome: int8/int32 [B, G] base codes; pad with GENOME_PAD (-1).
      read:   int8/int32 [B, R] base codes; pad with READ_PAD (-2).
      params: scoring parameters (negative penalties, reference convention).
      genome_row0: optional int8/int32 [B, G] alternative genome plane used
        for read row 0 only.  This is the colour-space contract
        (`sw-vector.c:111-147`): the read's first colour matches against
        `lstocs(genome_ls[j], initbp)` while later colours match the CS
        genome plane.

    Returns:
      int32 [B] best local alignment score (>= 0).
    """
    genome = genome.astype(jnp.int32)
    read = read.astype(jnp.int32)
    B, G = genome.shape
    _, R = read.shape

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))  # positive cost
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)

    # State per anti-diagonal, laid out [B, R] (cell index within diagonal = i,
    # the read position; genome position j = d - i).
    h_d1 = jnp.zeros((B, R), jnp.int32)       # H on diagonal d-1
    h_d2 = jnp.zeros((B, R), jnp.int32)       # H on diagonal d-2
    a_d1 = jnp.full((B, R), NEG_INF, jnp.int32)
    b_d1 = jnp.full((B, R), NEG_INF, jnp.int32)
    # genome characters on the current diagonal: gdiag[i] = genome[d - i]
    gdiag = jnp.full((B, R), GENOME_PAD, jnp.int32)
    best = jnp.zeros((B,), jnp.int32)

    n_diag = G + R - 1
    # row index i per diagonal slot, fixed
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)

    def shift_right(arr, fill):
        return jnp.concatenate(
            [jnp.full((B, 1), fill, arr.dtype), arr[:, :-1]], axis=1)

    def step(carry, d):
        h_d1, h_d2, a_d1, b_d1, gdiag, best = carry

        # slide the next genome char into diagonal slot 0
        gcol = jax.lax.dynamic_slice_in_dim(genome, d, 1, axis=1)  # [B,1]
        gdiag = jnp.concatenate([gcol, gdiag[:, :-1]], axis=1)

        # A-gap (gap in read, consumes genome): cell (i, j-1) is diag d-1 slot i
        a_d = jnp.maximum(h_d1 - aoe, a_d1 - ae)
        # B-gap (gap in genome, consumes read): cell (i-1, j) is diag d-1 slot i-1
        b_d = jnp.maximum(shift_right(h_d1, 0) - boe,
                          shift_right(b_d1, NEG_INF) - be)
        # match/mismatch from diag d-2 slot i-1
        ms = jnp.where(gdiag == read, m, x)
        if genome_row0 is not None:
            # read row 0 (slot 0) matches the alternative plane at column d
            g0 = jax.lax.dynamic_slice_in_dim(genome_row0_p, d, 1, axis=1)
            ms0 = jnp.where(g0 == read[:, :1], m, x)
            ms = jnp.concatenate([ms0, ms[:, 1:]], axis=1)
        h_diag = shift_right(h_d2, 0) + ms
        h_d = jnp.maximum(jnp.maximum(h_diag, 0), jnp.maximum(a_d, b_d))

        # mask off out-of-matrix slots: need 0 <= i <= d and j = d - i < G
        valid = (ii <= d) & (d - ii < G)
        h_d = jnp.where(valid, h_d, 0)
        a_d = jnp.where(valid, a_d, NEG_INF)
        b_d = jnp.where(valid, b_d, NEG_INF)

        best = jnp.maximum(best, jnp.max(h_d, axis=1))
        return (h_d, h_d1, a_d, b_d, gdiag, best), None

    # pad genome so dynamic_slice at d >= G stays in bounds (chars unused:
    # their slots are masked invalid)
    genome = jnp.pad(genome, ((0, 0), (0, R)), constant_values=GENOME_PAD)
    genome_row0_p = None
    if genome_row0 is not None:
        genome_row0_p = jnp.pad(genome_row0.astype(jnp.int32),
                                ((0, 0), (0, R)),
                                constant_values=GENOME_PAD)

    (h_d1, h_d2, a_d1, b_d1, gdiag, best), _ = jax.lax.scan(
        step, (h_d1, h_d2, a_d1, b_d1, gdiag, best),
        jnp.arange(n_diag, dtype=jnp.int32))
    return best


@functools.partial(jax.jit, static_argnames=("params",))
def sw_score_batch_rows(genome: jax.Array, read: jax.Array,
                        params: SWParams = SWParams(),
                        genome_row0: jax.Array | None = None) -> jax.Array:
    """Row-scan formulation of `sw_score_batch` (identical results).

    Scans read ROWS (R steps) instead of anti-diagonals (G+R-1 steps);
    the within-row affine A-gap recurrence
        A[j] = max(H[j-1] - aoe, A[j-1] - ae)
    collapses into one tilted running max
        A[j] = max_{k<j}(H0[k] + ae*k) - aoe - ae*(j-1)
    which is exact for affine costs (open cost >= 0: a gap re-opened from
    an A-derived cell can never beat extending, Farrar's lazy-F argument).
    ~2.5x fewer sequential steps and one `cummax` per row — the same
    structure a Pallas VMEM kernel would use."""
    genome = genome.astype(jnp.int32)
    read = read.astype(jnp.int32)
    B, G = genome.shape
    _, R = read.shape

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)

    jj = jnp.arange(G, dtype=jnp.int32)
    tilt = ae * jj                                  # [G]

    def shift_right(arr, fill):
        return jnp.concatenate(
            [jnp.full((B, 1), fill, arr.dtype), arr[:, :-1]], axis=1)

    g_main = genome
    g_first = genome if genome_row0 is None else genome_row0.astype(jnp.int32)

    def row(carry, xs):
        H_prev, Bg_prev, best, i = carry
        rc = xs[:, None]                             # [B, 1] read char
        gplane = jnp.where(i == 0, g_first, g_main) if genome_row0 is not None \
            else g_main
        ms = jnp.where(gplane == rc, m, x)
        Hdiag = shift_right(H_prev, 0) + ms
        Bg = jnp.maximum(H_prev - boe, Bg_prev - be)
        H0 = jnp.maximum(jnp.maximum(Hdiag, 0), Bg)
        run = jax.lax.cummax(H0 + tilt[None, :], axis=1)
        A = shift_right(run, NEG_INF) - aoe - ae * (jj[None, :] - 1)
        H = jnp.maximum(H0, A)
        # pad rows (read char = READ_PAD) must not contribute
        is_pad = rc == READ_PAD
        H = jnp.where(is_pad, H_prev, H)
        Bg = jnp.where(is_pad, Bg_prev, Bg)
        best = jnp.maximum(best, jnp.max(H, axis=1))
        return (H, Bg, best, i + 1), None

    H = jnp.zeros((B, G), jnp.int32)
    Bg = jnp.full((B, G), NEG_INF, jnp.int32)
    best = jnp.zeros((B,), jnp.int32)
    (H, Bg, best, _), _ = jax.lax.scan(
        row, (H, Bg, best, jnp.int32(0)), read.T)
    return best


def sw_score_numpy(genome, read, params: SWParams = SWParams(),
                   genome_row0=None) -> int:
    """NumPy oracle: straightforward O(G*R) local affine SW for one pair."""
    import numpy as np

    G, R = len(genome), len(read)
    H = np.zeros((R + 1, G + 1), np.int64)
    A = np.full((R + 1, G + 1), NEG_INF, np.int64)
    Bm = np.full((R + 1, G + 1), NEG_INF, np.int64)
    aoe = -(params.a_gap_open + params.a_gap_extend)
    ae = -params.a_gap_extend
    boe = -(params.b_gap_open + params.b_gap_extend)
    be = -params.b_gap_extend
    best = 0
    for i in range(1, R + 1):
        for j in range(1, G + 1):
            A[i][j] = max(H[i][j - 1] - aoe, A[i][j - 1] - ae)
            Bm[i][j] = max(H[i - 1][j] - boe, Bm[i - 1][j] - be)
            g = genome[j - 1] if (genome_row0 is None or i > 1) \
                else genome_row0[j - 1]
            ms = params.match if g == read[i - 1] else params.mismatch
            H[i][j] = max(0, H[i - 1][j - 1] + ms, A[i][j], Bm[i][j])
            best = max(best, H[i][j])
    return int(best)


# ---------------------------------------------------------------------------
# Engine dispatch: the three bit-identical pass-1 formulations.  The mapper
# auto-tunes the choice at its first production-shape batch (TPU only; see
# pipeline/mapper.py) the way the reference picks its SSE2 path once per
# run (sw_vector_setup, sw-vector.c:389).
PASS1_ENGINES = ("scan", "rows", "pallas")


def sw_score_engine(genome, read, params: SWParams = SWParams(),
                    genome_row0=None, engine: str = "scan",
                    interpret: bool | None = None):
    """Dispatch one pass-1 vector-SW scoring call to the named engine.

    All engines return identical int32 [B] scores; `engine` only selects
    the formulation ("scan" anti-diagonal wavefront, "rows" row-scan,
    "pallas" VMEM kernel).  `interpret` applies to the Pallas engine only;
    None = interpret automatically off TPU (CPU/test platforms)."""
    if engine == "rows":
        return sw_score_batch_rows(genome, read, params,
                                   genome_row0=genome_row0)
    if engine == "pallas":
        from shrimp_tpu.ops.sw_vector_pallas import sw_score_batch_pallas
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return sw_score_batch_pallas(genome, read, params,
                                     genome_row0=genome_row0,
                                     interpret=interpret)
    if engine != "scan":
        raise ValueError(f"unknown pass-1 engine {engine!r}; expected "
                         f"one of {PASS1_ENGINES}")
    return sw_score_batch(genome, read, params, genome_row0=genome_row0)

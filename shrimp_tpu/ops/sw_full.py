"""Batched full Smith-Waterman with traceback — the pass-2 kernel (L2c).

Covers `common/sw-full-ls.c`: 3-state affine DP with per-state backtrace,
local or "glocal" (read end-to-end, genome free) mode, strand-dependent
tie-breaking, and alignment statistics.

State model (exactly the reference's, which differs from the vector filter):
each cell keeps three scores — NW (arrived diagonally), N (arrived by a gap in
the genome consuming a read char, "b" gap), W (arrived by a gap in the read
consuming a genome char, "a" gap).  Gap states open **only from the NW state**
of their predecessor (`sw-full-ls.c:300-353` reads `score_northwest`), so
immediately adjacent insert+delete pairs are not chained, unlike the pass-1
vector kernel which opens gaps from the cell max (`sw-vector.c:172-179`).

TPU-native split:
  * the DP runs on device over anti-diagonals for a whole batch of candidate
    windows, emitting packed per-cell direction bits
    (uint8: west[2]<<4 | north[2]<<2 | nw[2]) in diagonal-major layout;
  * the traceback walks those bits on host in NumPy — pass 2 only sees
    ~num_outputs survivors per read (`gmapper/mapping.c:1649-1739`), so the
    walk is a trivial fraction of the work.

Tie-breaks replicated from `sw-full-ls.c:260-354`: forward strand prefers
NW > N > W on ties; the revcmpl flag flips each preference so reported
alignments are strand-stable (Tflag).  The best cell is the first row-major
cell attaining the maximum (`full_sw` strict-greater update, `:359-368`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops.sw_vector import GENOME_PAD, NEG_INF

# back-pointer codes, 2 bits per state (0 = stop/none)
NW_FROM_NW, NW_FROM_N, NW_FROM_W = 1, 2, 3
N_FROM_N, N_FROM_NW = 1, 2
W_FROM_W, W_FROM_NW = 1, 2

STATE_NW, STATE_N, STATE_W = 0, 1, 2

# edit ops produced by traceback (aligned-column order)
OP_MATCH = 0      # genome char aligned to read char
OP_INS = 1        # genome char vs gap in read (reference "insertion")
OP_DEL = 2        # read char vs gap in genome (reference "deletion")


@dataclass
class SWAlignment:
    """One full-SW alignment (reference `sw_full_results`,
    common/sw-full-common.h)."""

    score: int = 0
    read_start: int = 0
    genome_start: int = 0      # relative to the window
    rmapped: int = 0
    gmapped: int = 0
    matches: int = 0
    mismatches: int = 0
    insertions: int = 0
    deletions: int = 0
    ops: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))
    dbalign: str = ""
    qralign: str = ""


def _pick(*score_ptr_pairs):
    """max with tie preference for earlier args (strictly-greater replaces)."""
    best, which = score_ptr_pairs[0]
    for s, p in score_ptr_pairs[1:]:
        take = s > best
        best = jnp.where(take, s, best)
        which = jnp.where(take, p, which)
    return best, which


def compute_band(rect_x: np.ndarray, rect_y: np.ndarray, rect_len: np.ndarray,
                 rect_width: np.ndarray, glen: np.ndarray,
                 R: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row band limits from an anchor rectangle (anchor_get_x_range,
    common/anchors.c:67-96).  The rectangle is the already-joined+widened
    parallelogram: origin (x, y), diagonal extent `len`, anti-diagonal
    extent `width`.  Returns (x_min[B, R], x_max[B, R])."""
    B = len(rect_x)
    i = np.arange(R)[None, :]
    rx = rect_x[:, None].astype(np.int64)
    ry = rect_y[:, None].astype(np.int64)
    rl = rect_len[:, None].astype(np.int64)
    rw = rect_width[:, None].astype(np.int64)
    gl = glen[:, None].astype(np.int64)

    x_min = np.where(i < ry, 0,
                     np.where(i <= ry + rl - 1, rx + (i - ry), rx + rl))
    x_min = np.clip(x_min, 0, gl - 1)
    yw = ry - (rw - 1)
    x_max = np.where(i < yw, rx + rw - 2,
                     np.where(i <= yw + rl - 1, rx + (rw - 1) + (i - yw),
                              gl - 1))
    x_max = np.clip(x_max, 0, gl - 1)
    return x_min.astype(np.int32), x_max.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("params", "local_alignment"))
def sw_full_batch(genome: jax.Array, read: jax.Array, revcmpl: jax.Array,
                  params: SWParams = SWParams(),
                  local_alignment: bool = True,
                  band_xmin: jax.Array | None = None,
                  band_xmax: jax.Array | None = None):
    """Full 3-state DP for a batch of (window, read) pairs.

    Args:
      genome: int [B, G] codes, padded with GENOME_PAD (-1).
      read:   int [B, R] codes, padded with READ_PAD (-2).
      revcmpl: bool [B] — flip tie-break preferences for these lanes.
      local_alignment: local vs glocal (whole read must align; the
        reference's default since v2.2.0 — Gflag, gmapper.h:98).
      band_xmin/band_xmax: optional int32 [B, R] anchor-band column limits
        per read row (from compute_band).  Out-of-band cells take border
        values, replicating the banded DP (sw-full-ls.c:175-234,377-384).

    Returns:
      score:  int32 [B]
      best_i: int32 [B] read index of the alignment's last cell
      best_j: int32 [B] window index of the alignment's last cell
      states: int32 [B, 3] the (NW, N, W) scores at the best cell
      bits:   uint8 [n_diag, B, R] packed back-pointers; bits[i+j, b, i]
              belongs to cell (i, j).
    """
    genome = genome.astype(jnp.int32)
    read = read.astype(jnp.int32)
    B, G = genome.shape
    _, R = read.shape
    rc = revcmpl.astype(bool)[:, None]
    loc = bool(local_alignment)

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)
    a_go = jnp.int32(params.a_gap_open)   # border W state (negative)
    b_go = jnp.int32(params.b_gap_open)   # border N state

    rlen = jnp.sum(read >= 0, axis=1)
    glen = jnp.sum(genome >= 0, axis=1)

    ii = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)

    plane = lambda fill: jnp.full((B, R), fill, jnp.int32)
    nw_d1, nw_d2 = plane(NEG_INF), plane(NEG_INF)
    n_d1, n_d2 = plane(NEG_INF), plane(NEG_INF)
    w_d1, w_d2 = plane(NEG_INF), plane(NEG_INF)
    gdiag = plane(GENOME_PAD)
    best = jnp.zeros((B,), jnp.int32)
    best_i = jnp.zeros((B,), jnp.int32)
    best_j = jnp.zeros((B,), jnp.int32)
    best_states = jnp.zeros((B, 3), jnp.int32)

    n_diag = G + R - 1
    genome_p = jnp.pad(genome, ((0, 0), (0, R)), constant_values=GENOME_PAD)

    def shift(arr, fill):
        return jnp.concatenate(
            [jnp.full((B, 1), fill, arr.dtype), arr[:, :-1]], axis=1)

    def step(carry, d):
        (nw_d1, nw_d2, n_d1, n_d2, w_d1, w_d2, gdiag,
         best, best_i, best_j, best_states) = carry

        gcol = jax.lax.dynamic_slice_in_dim(genome_p, d, 1, axis=1)
        gdiag = jnp.concatenate([gcol, gdiag[:, :-1]], axis=1)
        jj = d - ii
        at_i0 = ii == 0
        at_j0 = jj == 0

        # --- predecessor states with virtual borders substituted ---
        # Virtual row -1 (i-1 < 0): local-style init everywhere
        #   (sw-full-ls.c:194-196): NW=0, N=b_gap_open, W=a_gap_open.
        # Virtual column -1 (j-1 < 0, i >= 0): local => same init;
        #   glocal => -inf (init_cell(.., 0), sw-full-ls.c:228-233).
        col_nw = jnp.int32(0) if loc else jnp.int32(NEG_INF)
        col_n = b_go if loc else jnp.int32(NEG_INF)
        col_w = a_go if loc else jnp.int32(NEG_INF)

        # west predecessor (i, j-1): diag d-1 slot i
        p_w_nw = jnp.where(at_j0, col_nw, nw_d1)
        p_w_w = jnp.where(at_j0, col_w, w_d1)
        # north predecessor (i-1, j): diag d-1 slot i-1
        p_n_nw = jnp.where(at_i0, 0, shift(nw_d1, NEG_INF))
        p_n_n = jnp.where(at_i0, b_go, shift(n_d1, NEG_INF))
        # northwest predecessor (i-1, j-1): diag d-2 slot i-1
        p_d_nw = jnp.where(at_i0, 0, jnp.where(at_j0, col_nw, shift(nw_d2, NEG_INF)))
        p_d_n = jnp.where(at_i0, b_go, jnp.where(at_j0, col_n, shift(n_d2, NEG_INF)))
        p_d_w = jnp.where(at_i0, a_go, jnp.where(at_j0, col_w, shift(w_d2, NEG_INF)))

        ms = jnp.where(gdiag == read, m, x)

        # --- NW state ---
        fs, fp = _pick((p_d_nw + ms, jnp.uint8(NW_FROM_NW)),
                       (p_d_n + ms, jnp.uint8(NW_FROM_N)),
                       (p_d_w + ms, jnp.uint8(NW_FROM_W)))
        rs, rp = _pick((p_d_w + ms, jnp.uint8(NW_FROM_W)),
                       (p_d_n + ms, jnp.uint8(NW_FROM_N)),
                       (p_d_nw + ms, jnp.uint8(NW_FROM_NW)))
        s_nw = jnp.where(rc, rs, fs)
        p_nw = jnp.where(rc, rp, fp)
        # --- N state (b gap: consumes read char) ---
        fs, fp = _pick((p_n_nw - boe, jnp.uint8(N_FROM_NW)),
                       (p_n_n - be, jnp.uint8(N_FROM_N)))
        rs, rp = _pick((p_n_n - be, jnp.uint8(N_FROM_N)),
                       (p_n_nw - boe, jnp.uint8(N_FROM_NW)))
        s_n = jnp.where(rc, rs, fs)
        p_n = jnp.where(rc, rp, fp)
        # --- W state (a gap: consumes genome char) ---
        fs, fp = _pick((p_w_nw - aoe, jnp.uint8(W_FROM_NW)),
                       (p_w_w - ae, jnp.uint8(W_FROM_W)))
        rs, rp = _pick((p_w_w - ae, jnp.uint8(W_FROM_W)),
                       (p_w_nw - aoe, jnp.uint8(W_FROM_NW)))
        s_w = jnp.where(rc, rs, fs)
        p_w = jnp.where(rc, rp, fp)

        if loc:  # zero-floor every state, zeroing its pointer (":293-350")
            z = s_nw <= 0
            s_nw = jnp.where(z, 0, s_nw); p_nw = jnp.where(z, 0, p_nw)
            z = s_n <= 0
            s_n = jnp.where(z, 0, s_n); p_n = jnp.where(z, 0, p_n)
            z = s_w <= 0
            s_w = jnp.where(z, 0, s_w); p_w = jnp.where(z, 0, p_w)

        if band_xmin is not None:
            # out-of-band cells take fresh border values (init_cell calls in
            # the banded row loop, sw-full-ls.c:228-233,377-384)
            in_band = (jj >= band_xmin) & (jj <= band_xmax)
            if loc:
                s_nw = jnp.where(in_band, s_nw, 0)
                s_n = jnp.where(in_band, s_n, b_go)
                s_w = jnp.where(in_band, s_w, a_go)
            else:
                s_nw = jnp.where(in_band, s_nw, NEG_INF)
                s_n = jnp.where(in_band, s_n, NEG_INF)
                s_w = jnp.where(in_band, s_w, NEG_INF)
            p_nw = jnp.where(in_band, p_nw, 0).astype(jnp.uint8)
            p_n = jnp.where(in_band, p_n, 0).astype(jnp.uint8)
            p_w = jnp.where(in_band, p_w, 0).astype(jnp.uint8)

        valid = (ii <= d) & (jj >= 0) & (ii < rlen[:, None]) & (jj < glen[:, None])
        fill_s = 0 if loc else NEG_INF
        s_nw = jnp.where(valid, s_nw, fill_s)
        s_n = jnp.where(valid, s_n, fill_s)
        s_w = jnp.where(valid, s_w, fill_s)
        p_nw = jnp.where(valid, p_nw, 0).astype(jnp.uint8)
        p_n = jnp.where(valid, p_n, 0).astype(jnp.uint8)
        p_w = jnp.where(valid, p_w, 0).astype(jnp.uint8)

        # --- best-cell tracking, replicating row-major first-strict-max ---
        cell = jnp.maximum(jnp.maximum(s_nw, s_n), s_w)
        eligible = valid if loc else (valid & (ii == rlen[:, None] - 1))
        cell = jnp.where(eligible, cell, NEG_INF)
        diag_best = jnp.max(cell, axis=1)
        slot = jnp.argmax(cell, axis=1).astype(jnp.int32)  # lowest i on ties
        cand_i, cand_j = slot, d - slot
        improved = (diag_best > best) | ((diag_best == best) & (diag_best > 0)
                                         & (cand_i < best_i))
        best = jnp.where(improved, diag_best, best)
        best_i = jnp.where(improved, cand_i, best_i)
        best_j = jnp.where(improved, cand_j, best_j)
        take = jnp.take_along_axis
        sl = slot[:, None]
        cand_states = jnp.concatenate(
            [take(s_nw, sl, 1), take(s_n, sl, 1), take(s_w, sl, 1)], axis=1)
        best_states = jnp.where(improved[:, None], cand_states, best_states)

        bits = (p_nw | (p_n << 2) | (p_w << 4)).astype(jnp.uint8)
        carry = (s_nw, nw_d1, s_n, n_d1, s_w, w_d1, gdiag,
                 best, best_i, best_j, best_states)
        return carry, bits

    carry0 = (nw_d1, nw_d2, n_d1, n_d2, w_d1, w_d2, gdiag,
              best, best_i, best_j, best_states)
    carry, bits = jax.lax.scan(step, carry0,
                               jnp.arange(n_diag, dtype=jnp.int32))
    (_, _, _, _, _, _, _, best, best_i, best_j, best_states) = carry
    if not loc:
        best = jnp.maximum(best, 0)  # degenerate all-neg case
    return best, best_i, best_j, best_states, bits


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment", "W"))
def sw_full_batch_packed(genome: jax.Array, read: jax.Array,
                        revcmpl: jax.Array, band_xmin: jax.Array,
                        band_xmax: jax.Array,
                        params: SWParams = SWParams(),
                        local_alignment: bool = True,
                        W: int = 32):
    """Band-packed form of `sw_full_batch` — bit-identical results.

    The banded DP ("necks", sw-full-ls.c:175-234, README:1415-1422) only
    has live cells at columns j in [band_xmin[i], band_xmax[i]] per read
    row; this kernel stores row i in packed coordinates u = j -
    band_xmin[i] with static width W >= max band width, scanning READ
    ROWS (R steps over [B, W] planes) instead of anti-diagonals (G+R-1
    steps over [B, R]) — ~(G*R)/(R*W) fewer cells and a (R, B, W) bits
    plane the traceback gathers from.

    The within-row W-state recurrence W[j] = max(NW[j-1]-aoe, W[j-1]-ae)
    collapses into one tilted cummax over the floored NW row (exact for
    affine costs; the local-mode zero floor cannot change which candidate
    wins a cell whose value survives the floor, and floored cells zero
    their pointer in both formulations).  Per-cell pointers are then
    recomputed elementwise from the exact predecessor values, preserving
    the forward/revcmpl tie preferences.

    Returns (score[B], best_i[B], best_j[B], states[B,3],
    bits[R, B, W]) with bits[i, b, j - band_xmin[i]] for cell (i, j).
    """
    genome = genome.astype(jnp.int32)
    read = read.astype(jnp.int32)
    B, G = genome.shape
    _, R = read.shape
    rc = revcmpl.astype(bool)[:, None]
    loc = bool(local_alignment)

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)
    a_go = jnp.int32(params.a_gap_open)
    b_go = jnp.int32(params.b_gap_open)

    rlen = jnp.sum(read >= 0, axis=1)
    glen = jnp.sum(genome >= 0, axis=1)
    fill_s = jnp.int32(0) if loc else jnp.int32(NEG_INF)
    # border triple for virtual row -1 / out-of-band cells
    bor_nw = jnp.int32(0) if loc else jnp.int32(NEG_INF)
    bor_n = b_go if loc else jnp.int32(NEG_INF)
    bor_w = a_go if loc else jnp.int32(NEG_INF)
    # virtual row -1 always carries the local-style init regardless of
    # mode (the at_i0 branch of the full kernel)
    r1_nw, r1_n, r1_w = jnp.int32(0), b_go, a_go

    uu = jnp.arange(W, dtype=jnp.int32)[None, :]           # [1, W]
    genome_p = jnp.pad(genome, ((0, 0), (0, W + 1)),
                       constant_values=GENOME_PAD)
    tilt = ae * jnp.arange(W + 1, dtype=jnp.int32)[None, :]

    # Per-row left-shift by a dynamic amount, as a log-decomposed chain
    # of STATIC shifts selected per row.  A per-lane take_along_axis
    # gather costs ~ms on the TPU (no cross-lane shuffle hardware — it
    # lowers to one-hot contractions); 7 conditional static shifts are
    # pure VPU selects.  Shift distances here are bounded by the genome
    # width (xmin < G <= padding below), asserted via the clip.
    SHIFT_PAD = 2                       # power of two > any shift (< G)
    while SHIFT_PAD < G:
        SHIFT_PAD <<= 1

    def shift_rows(P, d, border):
        """out[b, u] = P[b, u + d[b]] for d[b] >= 0, border beyond the
        right edge; P [B*, W*], d [B*, 1] int32."""
        Wp_ = P.shape[1]
        if getattr(border, "ndim", 0):  # per-row border column [B*, 1]
            fill = jnp.broadcast_to(border, (P.shape[0], SHIFT_PAD))
        else:
            fill = jnp.full((P.shape[0], SHIFT_PAD), border, P.dtype)
        ext = jnp.concatenate([P, fill.astype(P.dtype)], axis=1)
        dd = jnp.clip(d, 0, SHIFT_PAD - 1)
        k = SHIFT_PAD >> 1
        while k:
            shifted = jnp.concatenate(
                [ext[:, k:], fill[:, :k].astype(P.dtype)], axis=1)
            ext = jnp.where((dd & k) != 0, shifted, ext)
            k >>= 1
        return ext[:, :Wp_]

    bor3 = jnp.concatenate([
        jnp.full((B, 1), bor_nw, jnp.int32),
        jnp.full((B, 1), bor_n, jnp.int32),
        jnp.full((B, 1), bor_w, jnp.int32)], axis=0)       # [3B, 1]

    def step(carry, xs):
        (nw_p, n_p, w_p, xmin_p, best, best_i, best_j, best_states,
         i) = carry
        xmin_c, xmax_c, rchar = xs                 # [B], [B], [B]
        at_i0 = i == 0
        d = jnp.where(at_i0, 0, xmin_c - xmin_p)[:, None]   # [B, 1]

        # predecessor rows in current-packed coordinates: one stacked
        # [3B, W] shift-by-d (north preds) and one shift-by-(d-1) via a
        # prepended border column (diagonal preds)
        T = jnp.concatenate([nw_p, n_p, w_p], axis=0)       # [3B, W]
        d3 = jnp.tile(d, (3, 1))
        # one shifted width-(W+1) plane yields both predecessors:
        # out[u] = [bor|T][u+d], so out[:W] = T[u+d-1] (diagonal preds)
        # and out[1:] = T[u+d] (north preds)
        S = shift_rows(jnp.concatenate([bor3, T], axis=1), d3, bor3)
        S_d, S_n = S[:, :W], S[:, 1:]
        p_n_nw, p_n_n = S_n[:B], S_n[B:2 * B]
        p_d_nw, p_d_n, p_d_w = S_d[:B], S_d[B:2 * B], S_d[2 * B:]
        # virtual row -1 overrides every border (at_i0 precedence in the
        # full kernel)
        p_n_nw = jnp.where(at_i0, r1_nw, p_n_nw)
        p_n_n = jnp.where(at_i0, r1_n, p_n_n)
        p_d_nw = jnp.where(at_i0, r1_nw, p_d_nw)
        p_d_n = jnp.where(at_i0, r1_n, p_d_n)
        p_d_w = jnp.where(at_i0, r1_w, p_d_w)

        jj = xmin_c[:, None] + uu                  # real genome columns
        gchar = shift_rows(genome_p, xmin_c[:, None],
                           jnp.int32(GENOME_PAD))[:, :W]
        ms = jnp.where(gchar == rchar[:, None], m, x)

        # --- NW state (diag preds only) ---
        fs, fp = _pick((p_d_nw + ms, jnp.uint8(NW_FROM_NW)),
                       (p_d_n + ms, jnp.uint8(NW_FROM_N)),
                       (p_d_w + ms, jnp.uint8(NW_FROM_W)))
        rs, rp = _pick((p_d_w + ms, jnp.uint8(NW_FROM_W)),
                       (p_d_n + ms, jnp.uint8(NW_FROM_N)),
                       (p_d_nw + ms, jnp.uint8(NW_FROM_NW)))
        s_nw = jnp.where(rc, rs, fs)
        p_nw = jnp.where(rc, rp, fp)
        if loc:
            z = s_nw <= 0
            s_nw = jnp.where(z, 0, s_nw)
            p_nw = jnp.where(z, 0, p_nw)

        # --- N state (north preds only) ---
        fs, fp = _pick((p_n_nw - boe, jnp.uint8(N_FROM_NW)),
                       (p_n_n - be, jnp.uint8(N_FROM_N)))
        rs, rp = _pick((p_n_n - be, jnp.uint8(N_FROM_N)),
                       (p_n_nw - boe, jnp.uint8(N_FROM_NW)))
        s_n = jnp.where(rc, rs, fs)
        p_n = jnp.where(rc, rp, fp)
        if loc:
            z = s_n <= 0
            s_n = jnp.where(z, 0, s_n)
            p_n = jnp.where(z, 0, p_n)

        # --- W state: tilted cummax over [border_nw; floored NW row],
        # then max with the pure border-W extension chain ---
        cand = jnp.concatenate(
            [jnp.full((B, 1), bor_nw, jnp.int32), s_nw], axis=1)  # [B,W+1]
        run = jax.lax.cummax(cand + tilt, axis=1)
        # candidate via NW[k]: NW[k] - aoe - ae*(u-1-k); with cand index
        # c = k+1 (c=0 the j-1<0 border NW) that is
        # (cand[c] + ae*c) - aoe - ae*u, so W_chain[u] = run[u] - aoe
        # - ae*u
        chain = run[:, :-1] - aoe - ae * uu
        w_border = bor_w - ae * (uu + 1)           # extend border W only
        s_w = jnp.maximum(chain, w_border)
        # pointer: exact per-cell comparison of (NW[j-1]-aoe, W[j-1]-ae)
        w_floored = jnp.maximum(s_w, 0) if loc else s_w
        nw_west = jnp.concatenate(
            [jnp.full((B, 1), bor_nw, jnp.int32), s_nw[:, :-1]], axis=1)
        w_west = jnp.concatenate(
            [jnp.full((B, 1), bor_w, jnp.int32), w_floored[:, :-1]],
            axis=1)
        c_nw = nw_west - aoe
        c_w = w_west - ae
        p_w_f = jnp.where(c_nw >= c_w, jnp.uint8(W_FROM_NW),
                          jnp.uint8(W_FROM_W))
        p_w_r = jnp.where(c_w >= c_nw, jnp.uint8(W_FROM_W),
                          jnp.uint8(W_FROM_NW))
        p_w = jnp.where(rc, p_w_r, p_w_f)
        if loc:
            z = s_w <= 0
            s_w = jnp.where(z, 0, s_w)
            p_w = jnp.where(z, 0, p_w)

        # --- band-width masking within the row, then grid validity ---
        in_band = uu <= (xmax_c - xmin_c)[:, None]
        s_nw = jnp.where(in_band, s_nw, bor_nw)
        s_n = jnp.where(in_band, s_n, bor_n)
        s_w = jnp.where(in_band, s_w, bor_w)
        p_nw = jnp.where(in_band, p_nw, 0).astype(jnp.uint8)
        p_n = jnp.where(in_band, p_n, 0).astype(jnp.uint8)
        p_w = jnp.where(in_band, p_w, 0).astype(jnp.uint8)
        valid = (jj < glen[:, None]) & (i < rlen[:, None])
        s_nw = jnp.where(valid, s_nw, fill_s)
        s_n = jnp.where(valid, s_n, fill_s)
        s_w = jnp.where(valid, s_w, fill_s)
        p_nw = jnp.where(valid, p_nw, 0).astype(jnp.uint8)
        p_n = jnp.where(valid, p_n, 0).astype(jnp.uint8)
        p_w = jnp.where(valid, p_w, 0).astype(jnp.uint8)

        # --- best tracking: rows in order == row-major first-strict-max
        # (within a row argmax takes the lowest packed u = lowest j) ---
        cell = jnp.maximum(jnp.maximum(s_nw, s_n), s_w)
        eligible = valid if loc else (valid & (i == rlen[:, None] - 1))
        cell = jnp.where(eligible, cell, NEG_INF)
        row_best = jnp.max(cell, axis=1)
        slot = jnp.argmax(cell, axis=1).astype(jnp.int32)
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, i, best_i)
        best_j = jnp.where(improved, xmin_c + slot, best_j)
        take = jnp.take_along_axis
        sl = slot[:, None]
        cand_states = jnp.concatenate(
            [take(s_nw, sl, 1), take(s_n, sl, 1), take(s_w, sl, 1)],
            axis=1)
        best_states = jnp.where(improved[:, None], cand_states,
                                best_states)

        bits = (p_nw | (p_n << 2) | (p_w << 4)).astype(jnp.uint8)
        return (s_nw, s_n, s_w, xmin_c, best, best_i, best_j,
                best_states, i + 1), bits

    plane = lambda fill: jnp.full((B, W), fill, jnp.int32)
    carry0 = (plane(NEG_INF), plane(NEG_INF), plane(NEG_INF),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              jnp.zeros((B, 3), jnp.int32), jnp.int32(0))
    xs = (band_xmin.astype(jnp.int32).T, band_xmax.astype(jnp.int32).T,
          read.T)
    carry, bits = jax.lax.scan(step, carry0, xs)
    (_, _, _, _, best, best_i, best_j, best_states, _) = carry
    if not loc:
        best = jnp.maximum(best, 0)
    return best, best_i, best_j, best_states, bits


@jax.jit
def traceback_batch_packed_jax(bits: jax.Array, band_xmin: jax.Array,
                               bi: jax.Array, bj: jax.Array,
                               states: jax.Array, genome: jax.Array,
                               read: jax.Array, score: jax.Array):
    """On-device traceback over the packed (R, B, W) bits plane; cell
    (i, j) lives at bits[i, b, j - band_xmin[b, i]].  Same walk as
    `traceback_batch_jax` (same outputs), ~4x smaller gather source."""
    R_, B, W = bits.shape
    G = genome.shape[1]
    max_steps = R_ + G
    lanes = jnp.arange(B)
    xmin = band_xmin.astype(jnp.int32)

    s_nw, s_n, s_w = states[:, 0], states[:, 1], states[:, 2]
    state = jnp.full(B, STATE_NW, jnp.int32)
    best = s_nw
    take = s_w > best
    state = jnp.where(take, STATE_W, state)
    best = jnp.where(take, s_w, best)
    state = jnp.where(s_n > best, STATE_N, state)

    genome32 = genome.astype(jnp.int32)
    read32 = read.astype(jnp.int32)

    # while_loop with an all-lanes-inactive early exit: typical walks end
    # after ~rlen steps, so the R+G-step scan wasted >60% of its
    # iterations; the loop stops as soon as every lane's pointer chain
    # ended (~20% off the fused DP+traceback at production shapes)
    def cond(c):
        return c[-1]

    def body(c):
        (i, j, st, active, rs, gs, mt, mm, ins, dl, nops, ops_buf,
         step, _) = c
        ii = jnp.clip(i, 0, R_ - 1).astype(jnp.int32)
        jj = jnp.clip(j, 0, G - 1).astype(jnp.int32)
        # a predecessor step can point at an out-of-band cell; those
        # cells carry pointer 0 in the full-grid plane (walk stops) —
        # replicate by forcing cell 0 outside the packed band
        u_raw = jj - xmin[lanes, ii]
        inb = (u_raw >= 0) & (u_raw < W)
        cell = jnp.where(
            inb, bits[ii, lanes, jnp.clip(u_raw, 0, W - 1)],
            jnp.uint8(0)).astype(jnp.int32)
        ptr = jnp.where(st == STATE_NW, cell & 3,
                        jnp.where(st == STATE_N, (cell >> 2) & 3,
                                  (cell >> 4) & 3))
        step_active = active & (ptr != 0)
        is_nw = step_active & (st == STATE_NW)
        is_n = step_active & (st == STATE_N)
        is_w = step_active & (st == STATE_W)

        op = jnp.where(is_n, OP_DEL, jnp.where(is_w, OP_INS, OP_MATCH)
                       ).astype(jnp.uint8)
        nops = nops + step_active

        eq = genome32[lanes, jj] == read32[lanes, jnp.minimum(ii, R_ - 1)]
        mt = mt + (is_nw & eq)
        mm = mm + (is_nw & ~eq)
        dl = dl + is_n
        ins = ins + is_w
        rs = jnp.where(is_nw | is_n, i, rs)
        gs = jnp.where(is_nw | is_w, j, gs)
        i = i - (is_nw | is_n)
        j = j - (is_nw | is_w)

        nxt = jnp.where(
            is_nw,
            jnp.where(ptr == NW_FROM_NW, STATE_NW,
                      jnp.where(ptr == NW_FROM_N, STATE_N, STATE_W)),
            jnp.where(is_n,
                      jnp.where(ptr == N_FROM_N, STATE_N, STATE_NW),
                      jnp.where(ptr == W_FROM_W, STATE_W, STATE_NW)))
        st = jnp.where(step_active, nxt, st)
        active = step_active & (i >= 0) & (j >= 0)
        ops_buf = jax.lax.dynamic_update_slice(ops_buf, op[None, :],
                                               (step, 0))
        cont = jnp.any(active) & (step + 1 < max_steps)
        return (i, j, st, active, rs, gs, mt, mm, ins, dl, nops,
                ops_buf, step + 1, cont)

    zeros = jnp.zeros(B, jnp.int32)
    carry0 = (bi.astype(jnp.int32), bj.astype(jnp.int32), state, score > 0,
              zeros, zeros, zeros, zeros, zeros, zeros, zeros,
              jnp.zeros((max_steps, B), jnp.uint8), jnp.int32(0),
              jnp.any(score > 0))
    (i, j, st, active, rs, gs, mt, mm, ins, dl, nops, ops_steps,
     _, _) = jax.lax.while_loop(cond, body, carry0)
    ops = ops_steps.T

    k = jnp.arange(max_steps)[None, :]
    src = jnp.clip(nops[:, None] - 1 - k, 0, max_steps - 1)
    ops_rev = jnp.take_along_axis(ops, src, axis=1)
    ops_rev = jnp.where(k < nops[:, None], ops_rev, 0).astype(jnp.uint8)

    return {
        "read_start": rs, "genome_start": gs,
        "matches": mt, "mismatches": mm,
        "insertions": ins, "deletions": dl,
        "rmapped": mt + mm + dl, "gmapped": mt + mm + ins,
        "ops": ops_rev, "ops_len": nops,
    }


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment", "W"))
def sw_full_and_traceback_packed_jax(genome: jax.Array, read: jax.Array,
                                     revcmpl: jax.Array,
                                     band_xmin: jax.Array,
                                     band_xmax: jax.Array,
                                     params: SWParams = SWParams(),
                                     local_alignment: bool = False,
                                     W: int = 32):
    """Band-packed DP + traceback in one dispatch; same (stats, ops)
    contract as `sw_full_and_traceback_jax`, bit-identical outputs."""
    score, bi, bj, states, bits = sw_full_batch_packed(
        genome, read, revcmpl, band_xmin, band_xmax, params,
        local_alignment, W)
    tb = traceback_batch_packed_jax(bits, band_xmin, bi, bj, states,
                                    genome, read, score)
    stats = jnp.stack([
        score, tb["read_start"], tb["genome_start"], tb["matches"],
        tb["mismatches"], tb["insertions"], tb["deletions"], tb["rmapped"],
        tb["gmapped"], tb["ops_len"]], axis=1).astype(jnp.int32)
    return stats, tb["ops"]


# ---------------------------------------------------------------------------
# Host-side traceback
# ---------------------------------------------------------------------------
_NW_PRED = {NW_FROM_NW: STATE_NW, NW_FROM_N: STATE_N, NW_FROM_W: STATE_W}
_N_PRED = {N_FROM_N: STATE_N, N_FROM_NW: STATE_NW}
_W_PRED = {W_FROM_W: STATE_W, W_FROM_NW: STATE_NW}


def traceback_one(bits: np.ndarray, b: int, i: int, j: int,
                  states: np.ndarray, genome_row: np.ndarray,
                  read_row: np.ndarray, score: int) -> SWAlignment:
    """Walk the packed direction bits for one lane (do_backtrace,
    sw-full-ls.c:413-516)."""
    res = SWAlignment(score=int(score))
    # choose starting state: NW preferred, then W, then N (strictly greater)
    s_nw, s_n, s_w = int(states[0]), int(states[1]), int(states[2])
    state, s_best = STATE_NW, s_nw
    if s_w > s_best:
        state, s_best = STATE_W, s_w
    if s_n > s_best:
        state, s_best = STATE_N, s_n
    ops: list[int] = []
    while i >= 0 and j >= 0:
        cell = int(bits[i + j, b, i])
        p_nw, p_n, p_w = cell & 3, (cell >> 2) & 3, (cell >> 4) & 3
        if state == STATE_NW:
            ptr = p_nw
            if ptr == 0:
                break
            ops.append(OP_MATCH)
            if genome_row[j] == read_row[i]:
                res.matches += 1
            else:
                res.mismatches += 1
            res.read_start, res.genome_start = i, j
            i -= 1
            j -= 1
            state = _NW_PRED[ptr]
        elif state == STATE_N:
            ptr = p_n
            if ptr == 0:
                break
            ops.append(OP_DEL)
            res.deletions += 1
            res.read_start = i
            i -= 1
            state = _N_PRED[ptr]
        else:
            ptr = p_w
            if ptr == 0:
                break
            ops.append(OP_INS)
            res.insertions += 1
            res.genome_start = j
            j -= 1
            state = _W_PRED[ptr]
    res.ops = np.array(ops[::-1], dtype=np.uint8)
    res.rmapped = res.matches + res.mismatches + res.deletions
    res.gmapped = res.matches + res.mismatches + res.insertions
    return res


def render_alignment(res: SWAlignment, genome_row: np.ndarray,
                     read_row: np.ndarray) -> None:
    """Fill dbalign/qralign strings (pretty_print, sw-full-ls.c:524-560)."""
    from shrimp_tpu import dna

    d_chars, q_chars = [], []
    gi, ri = res.genome_start, res.read_start
    for op in res.ops:
        if op == OP_MATCH:
            d_chars.append(dna.LS_CHARS[genome_row[gi] & 15])
            q_chars.append(dna.LS_CHARS[read_row[ri] & 15])
            gi += 1
            ri += 1
        elif op == OP_INS:
            d_chars.append(dna.LS_CHARS[genome_row[gi] & 15])
            q_chars.append(ord("-"))
            gi += 1
        else:
            d_chars.append(ord("-"))
            q_chars.append(dna.LS_CHARS[read_row[ri] & 15])
            ri += 1
    res.dbalign = bytes(d_chars).decode()
    res.qralign = bytes(q_chars).decode()


@jax.jit
def traceback_batch_jax(bits: jax.Array, bi: jax.Array, bj: jax.Array,
                        states: jax.Array, genome: jax.Array,
                        read: jax.Array, score: jax.Array):
    """On-device traceback for all lanes at once (lax.scan over walk steps).

    Avoids shipping the packed-bits plane to the host: only the compact
    per-lane results and the op strings come back.  Returns the same dict of
    arrays as `traceback_batch`.
    """
    n_diag, B, R = bits.shape
    G = genome.shape[1]
    max_steps = R + G
    lanes = jnp.arange(B)

    s_nw, s_n, s_w = states[:, 0], states[:, 1], states[:, 2]
    state = jnp.full(B, STATE_NW, jnp.int32)
    best = s_nw
    take = s_w > best
    state = jnp.where(take, STATE_W, state)
    best = jnp.where(take, s_w, best)
    state = jnp.where(s_n > best, STATE_N, state)

    genome32 = genome.astype(jnp.int32)
    read32 = read.astype(jnp.int32)

    def step(carry, _):
        (i, j, st, active, rs, gs, mt, mm, ins, dl, nops) = carry
        ii = jnp.maximum(i, 0).astype(jnp.int32)
        jj = jnp.maximum(j, 0).astype(jnp.int32)
        cell = bits[ii + jj, lanes, ii].astype(jnp.int32)
        ptr = jnp.where(st == STATE_NW, cell & 3,
                        jnp.where(st == STATE_N, (cell >> 2) & 3,
                                  (cell >> 4) & 3))
        step_active = active & (ptr != 0)
        is_nw = step_active & (st == STATE_NW)
        is_n = step_active & (st == STATE_N)
        is_w = step_active & (st == STATE_W)

        # op emitted as a stacked scan output — a lane's walk occupies its
        # first nops steps (active is monotone), so no scatter is needed
        op = jnp.where(is_n, OP_DEL, jnp.where(is_w, OP_INS, OP_MATCH)
                       ).astype(jnp.uint8)
        nops = nops + step_active

        eq = genome32[lanes, jnp.minimum(jj, G - 1)] == \
            read32[lanes, jnp.minimum(ii, R - 1)]
        mt = mt + (is_nw & eq)
        mm = mm + (is_nw & ~eq)
        dl = dl + is_n
        ins = ins + is_w
        rs = jnp.where(is_nw | is_n, i, rs)
        gs = jnp.where(is_nw | is_w, j, gs)
        i = i - (is_nw | is_n)
        j = j - (is_nw | is_w)

        nxt = jnp.where(
            is_nw,
            jnp.where(ptr == NW_FROM_NW, STATE_NW,
                      jnp.where(ptr == NW_FROM_N, STATE_N, STATE_W)),
            jnp.where(is_n,
                      jnp.where(ptr == N_FROM_N, STATE_N, STATE_NW),
                      jnp.where(ptr == W_FROM_W, STATE_W, STATE_NW)))
        st = jnp.where(step_active, nxt, st)
        active = step_active & (i >= 0) & (j >= 0)
        return (i, j, st, active, rs, gs, mt, mm, ins, dl, nops), op

    zeros = jnp.zeros(B, jnp.int32)
    carry0 = (bi.astype(jnp.int32), bj.astype(jnp.int32), state, score > 0,
              zeros, zeros, zeros, zeros, zeros, zeros, zeros)
    (i, j, st, active, rs, gs, mt, mm, ins, dl,
     nops), ops_steps = jax.lax.scan(step, carry0, None, length=max_steps)
    ops = ops_steps.T                       # [B, max_steps], newest-first

    # reverse each lane's prefix
    k = jnp.arange(max_steps)[None, :]
    src = jnp.clip(nops[:, None] - 1 - k, 0, max_steps - 1)
    ops_rev = jnp.take_along_axis(ops, src, axis=1)
    ops_rev = jnp.where(k < nops[:, None], ops_rev, 0).astype(jnp.uint8)

    return {
        "read_start": rs, "genome_start": gs,
        "matches": mt, "mismatches": mm,
        "insertions": ins, "deletions": dl,
        "rmapped": mt + mm + dl, "gmapped": mt + mm + ins,
        "ops": ops_rev, "ops_len": nops,
    }


@functools.partial(jax.jit, static_argnames=("params", "local_alignment"))
def sw_full_and_traceback_jax(genome: jax.Array, read: jax.Array,
                              revcmpl: jax.Array,
                              params: SWParams = SWParams(),
                              local_alignment: bool = False,
                              band_xmin: jax.Array | None = None,
                              band_xmax: jax.Array | None = None):
    """Fused DP + traceback in a single device dispatch.

    Returns (stats int32 [B, 10], ops uint8 [B, R+G]) where stats columns are
    (score, read_start, genome_start, matches, mismatches, insertions,
    deletions, rmapped, gmapped, ops_len).  One dispatch + one transfer —
    the packed-bits plane never leaves the device.
    """
    score, bi, bj, states, bits = sw_full_batch(
        genome, read, revcmpl, params, local_alignment, band_xmin, band_xmax)
    tb = traceback_batch_jax(bits, bi, bj, states, genome, read, score)
    stats = jnp.stack([
        score, tb["read_start"], tb["genome_start"], tb["matches"],
        tb["mismatches"], tb["insertions"], tb["deletions"], tb["rmapped"],
        tb["gmapped"], tb["ops_len"]], axis=1).astype(jnp.int32)
    return stats, tb["ops"]


def traceback_batch(bits: np.ndarray, bi: np.ndarray, bj: np.ndarray,
                    states: np.ndarray, genome: np.ndarray,
                    read: np.ndarray, score: np.ndarray):
    """Vectorized traceback over all lanes at once.

    Returns a dict of per-lane arrays: read_start, genome_start, rmapped,
    gmapped, matches, mismatches, insertions, deletions, ops (uint8 [B, L]
    front-aligned), ops_len.
    """
    B = len(bi)
    _, _, R = bits.shape
    G = genome.shape[1]
    max_steps = R + G

    # starting state per lane: NW preferred, then W, then N (strict >)
    s_nw, s_n, s_w = states[:, 0], states[:, 1], states[:, 2]
    state = np.zeros(B, np.int8)
    best = s_nw.copy()
    take = s_w > best
    state[take] = STATE_W
    best[take] = s_w[take]
    take = s_n > best
    state[take] = STATE_N

    i = bi.astype(np.int64).copy()
    j = bj.astype(np.int64).copy()
    active = score > 0
    ops = np.zeros((B, max_steps), np.uint8)
    read_start = np.zeros(B, np.int64)
    genome_start = np.zeros(B, np.int64)
    matches = np.zeros(B, np.int64)
    mismatches = np.zeros(B, np.int64)
    insertions = np.zeros(B, np.int64)
    deletions = np.zeros(B, np.int64)
    n_ops = np.zeros(B, np.int64)

    bits_flat = bits.reshape(-1)
    lanes = np.arange(B, dtype=np.int64)
    for _ in range(max_steps):
        if not active.any():
            break
        ii = np.where(active, i, 0)
        jj = np.where(active, j, 0)
        cell = bits_flat[(ii + jj) * (B * R) + lanes * R + ii]
        ptr = np.where(state == STATE_NW, cell & 3,
                       np.where(state == STATE_N, (cell >> 2) & 3,
                                (cell >> 4) & 3))
        step_active = active & (ptr != 0)
        is_nw = step_active & (state == STATE_NW)
        is_n = step_active & (state == STATE_N)
        is_w = step_active & (state == STATE_W)

        # record ops (walk emits back-to-front; reversed afterwards)
        op = np.where(is_n, OP_DEL, np.where(is_w, OP_INS, OP_MATCH))
        ops[lanes[step_active], n_ops[step_active]] = op[step_active]
        n_ops[step_active] += 1

        eq = genome[lanes, np.minimum(jj, G - 1)] == read[lanes, np.minimum(ii, R - 1)]
        matches += is_nw & eq
        mismatches += is_nw & ~eq
        deletions += is_n
        insertions += is_w
        read_start[is_nw | is_n] = i[is_nw | is_n]
        genome_start[is_nw | is_w] = j[is_nw | is_w]
        i[is_nw | is_n] -= 1
        j[is_nw | is_w] -= 1

        # next state from pointer
        nxt = state.copy()
        nxt[is_nw] = np.where(ptr[is_nw] == NW_FROM_NW, STATE_NW,
                              np.where(ptr[is_nw] == NW_FROM_N, STATE_N,
                                       STATE_W))
        nxt[is_n] = np.where(ptr[is_n] == N_FROM_N, STATE_N, STATE_NW)
        nxt[is_w] = np.where(ptr[is_w] == W_FROM_W, STATE_W, STATE_NW)
        state = nxt
        active = step_active & (i >= 0) & (j >= 0)

    # ops were recorded newest-first; reverse each lane's prefix
    for b in np.flatnonzero(n_ops):
        ops[b, :n_ops[b]] = ops[b, :n_ops[b]][::-1]

    return {
        "read_start": read_start, "genome_start": genome_start,
        "matches": matches, "mismatches": mismatches,
        "insertions": insertions, "deletions": deletions,
        "rmapped": matches + mismatches + deletions,
        "gmapped": matches + mismatches + insertions,
        "ops": ops, "ops_len": n_ops,
    }


def sw_full_with_traceback(genome: np.ndarray, read: np.ndarray,
                           revcmpl: np.ndarray,
                           params: SWParams = SWParams(),
                           local_alignment: bool = True,
                           render: bool = True,
                           band_xmin: np.ndarray | None = None,
                           band_xmax: np.ndarray | None = None
                           ) -> list[SWAlignment]:
    """Device DP + host traceback for a batch; returns one SWAlignment per
    lane (lanes whose score is 0 return an empty alignment)."""
    score, bi, bj, states, bits = sw_full_batch(
        jnp.asarray(genome), jnp.asarray(read), jnp.asarray(revcmpl),
        params, local_alignment,
        None if band_xmin is None else jnp.asarray(band_xmin),
        None if band_xmax is None else jnp.asarray(band_xmax))
    score = np.asarray(score)
    bi = np.asarray(bi)
    bj = np.asarray(bj)
    states = np.asarray(states)
    bits = np.asarray(bits)
    out = []
    for b in range(genome.shape[0]):
        if score[b] <= 0:
            out.append(SWAlignment(score=int(score[b])))
            continue
        res = traceback_one(bits, b, int(bi[b]), int(bj[b]), states[b],
                            genome[b], read[b], int(score[b]))
        if render:
            render_alignment(res, genome[b], read[b])
        out.append(res)
    return out

"""Batched colour-space full Smith-Waterman — the CS pass-2 kernel (L2d).

Covers `common/sw-full-cs.c`: four parallel affine DP layers, one per
letter-space decoding of the colour read (layer k decodes from initial letter
`(initbp + k) % 4`), with inter-layer "crossover" transitions that model
colour sequencing errors.  A crossover costs `crossover_score` globally or a
per-colour qv-derived penalty (`gmapper.c:533-546`).

Semantics mirrored from the reference (`sw-full-cs.c:245-620`):
  * 3 states per layer per cell: NW (diagonal), N (read char vs genome gap),
    W (genome char vs read gap).
  * NW accepts same-layer nw/n/w predecessors and cross-layer nw/n/w with the
    crossover penalty; N accepts same-layer nw/n and cross-layer nw/n with the
    penalty; W accepts same-layer nw/w only ("it doesn't make sense to cross
    over on a genomic gap", :535-538).
  * match score is 0 when either character is N (:345-348); the traceback
    counts N columns as matches (:713).
  * local floors: layer 0 resets to 0, layers 1-3 reset to the row's
    crossover penalty (init_cell, :199-243), so a non-primary layer can start
    anywhere at the cost of one crossover.
  * the top virtual row is always initialised local-style with the *global*
    crossover penalty (:266-268), even in glocal mode — genome offset is free.
  * indel-taboo zone: within the last `indel_taboo_len` read rows, gap opens
    are forbidden / extensions forced (:353-**, default len 0).
  * tie-breaks: row-major first strict max over (i, j, k); within a cell,
    forward order nw,n,w / reverse order w,n,nw, same-layer before
    cross-layer, cross layers in ascending order.

TPU-native split mirrors ops/sw_full.py: anti-diagonal wavefront over a batch
of windows with 4-layer state planes, packed 4-bit back-pointers, and a fused
on-device traceback emitting per-column (op, layer, crossover) codes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops.sw_vector import GENOME_PAD, NEG_INF

BASE_N = 15

STATE_NW, STATE_N, STATE_W = 0, 1, 2

# op codes in the traceback output (bits 0-1), matching ops/sw_full.py
OP_MATCH = 0      # genome char aligned to read char
OP_INS = 1        # genome char vs gap in read
OP_DEL = 2        # read char vs gap in genome
# bits 2-3: layer the column was emitted from; bit 4: crossover flag
OP_XOVER = 0x10


def _ptr(layer, src_state):
    """4-bit pointer payload: 0 = stop, else 1 + layer*3 + src_state."""
    return 1 + layer * 3 + src_state


def cross_layers(k, order):
    return [l for l in order if l != k]


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment", "taboo_len"))
def sw_full_cs_batch(genome_ls: jax.Array, qr4: jax.Array,
                     xover_row: jax.Array, revcmpl: jax.Array,
                     params: SWParams = SWParams(),
                     local_alignment: bool = True,
                     taboo_len: int = 0,
                     band_xmin: jax.Array | None = None,
                     band_xmax: jax.Array | None = None):
    """Four-layer colour-space DP for a batch of (window, read) pairs.

    Args:
      genome_ls: int [B, G] letter-space window codes, padded GENOME_PAD.
      qr4: int [B, 4, R] the four letter-space decodings of the colour read
        (layer k starts from letter (initbp+k)%4; N colours reset the chain),
        padded with READ_PAD beyond the read length.
      xover_row: int32 [B, R] crossover penalty (negative) per read row —
        the per-colour qv-derived scores, or the global crossover everywhere.
      revcmpl: bool [B] — flip tie-break preferences (Tflag strand-stability).
      band_xmin/band_xmax: optional int32 [B, R] anchor-band column limits.

    Returns:
      score:   int32 [B]
      best_i:  int32 [B], best_j: int32 [B], best_k: int32 [B]
      states:  int32 [B, 3] (NW, N, W) scores of the best cell's best layer
      bits:    uint16 [n_diag, B, 4, R] packed 4-bit back-pointers
               (nw | n<<4 | w<<8); bits[i+j, b, k, i] belongs to cell (i,j,k).
    """
    genome_ls = genome_ls.astype(jnp.int32)
    qr4 = qr4.astype(jnp.int32)
    B, G = genome_ls.shape
    _, _, R = qr4.shape
    rc = revcmpl.astype(bool)[:, None, None]
    loc = bool(local_alignment)

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)
    a_go = jnp.int32(params.a_gap_open)    # negative
    b_go = jnp.int32(params.b_gap_open)
    gxp = jnp.int32(params.crossover)      # global crossover (top-row init)

    # layer-k extra on init values: 0 for k=0, crossover penalty for k>=1
    kk = jax.lax.broadcasted_iota(jnp.int32, (B, 4, R), 1)
    xp = xover_row.astype(jnp.int32)[:, None, :]          # [B, 1, R] row pen
    init_extra = jnp.where(kk == 0, 0, xp)                # [B, 4, R]
    # virtual row -1 uses the *global* crossover for k>=1 (sw-full-cs.c:266)
    top_extra = jnp.where(kk == 0, 0, gxp)

    rlen = jnp.sum(qr4[:, 0, :] >= 0, axis=1)             # [B]
    glen = jnp.sum(genome_ls >= 0, axis=1)

    ii = jax.lax.broadcasted_iota(jnp.int32, (B, 4, R), 2)
    ii2 = ii[:, 0, :]                                     # [B, R]
    taboo_ok = ii < (rlen[:, None, None] - taboo_len)     # [B, 4, R]

    plane = lambda fill: jnp.full((B, 4, R), fill, jnp.int32)
    nw_d1, nw_d2 = plane(NEG_INF), plane(NEG_INF)
    n_d1, n_d2 = plane(NEG_INF), plane(NEG_INF)
    w_d1, w_d2 = plane(NEG_INF), plane(NEG_INF)
    gdiag = jnp.full((B, R), GENOME_PAD, jnp.int32)
    best = jnp.zeros((B,), jnp.int32)
    best_i = jnp.zeros((B,), jnp.int32)
    best_j = jnp.zeros((B,), jnp.int32)
    best_k = jnp.zeros((B,), jnp.int32)
    best_states = jnp.zeros((B, 3), jnp.int32)

    n_diag = G + R - 1
    genome_p = jnp.pad(genome_ls, ((0, 0), (0, R)), constant_values=GENOME_PAD)

    def shiftL(arr, fill):
        """Shift right along the slot axis (predecessor at slot i-1)."""
        pad = jnp.full(arr.shape[:-1] + (1,), fill, arr.dtype)
        return jnp.concatenate([pad, arr[..., :-1]], axis=-1)

    def pick(cands):
        """First-strict-max over an ordered candidate list of (score, ptr)."""
        s_best, p_best = cands[0]
        p_best = jnp.full_like(s_best, p_best).astype(jnp.int32)
        for s, p in cands[1:]:
            take = s > s_best
            s_best = jnp.where(take, s, s_best)
            p_best = jnp.where(take, p, p_best)
        return s_best, p_best

    def step(carry, d):
        (nw_d1, nw_d2, n_d1, n_d2, w_d1, w_d2, gdiag,
         best, best_i, best_j, best_k, best_states) = carry

        gcol = jax.lax.dynamic_slice_in_dim(genome_p, d, 1, axis=1)
        gdiag = jnp.concatenate([gcol, gdiag[:, :-1]], axis=1)
        jj = d - ii                       # [B, 4, R]
        at_i0 = ii == 0
        at_j0 = jj == 0

        # border init values (init_cell, sw-full-cs.c:199-243)
        # column -1 at virtual row r: local => (0, b_go, a_go) + extra(r, k);
        # glocal => NEG_INF.  extra(r) for the nw predecessor is row r-1's.
        if loc:
            col_nw = init_extra
            col_n = b_go + init_extra
            col_w = a_go + init_extra
            colm1_nw = shiftL(init_extra, 0)     # row i-1's penalty
            colm1_n = b_go + colm1_nw
            colm1_w = a_go + colm1_nw
        else:
            col_nw = col_n = col_w = jnp.int32(NEG_INF)
            colm1_nw = colm1_n = colm1_w = jnp.int32(NEG_INF)
        # virtual row -1 (always local-style, global crossover)
        top_nw = top_extra
        top_n = b_go + top_extra
        top_w = a_go + top_extra

        # west predecessor (i, j-1): diag d-1 slot i
        p_w_nw = jnp.where(at_j0, col_nw, nw_d1)
        p_w_w = jnp.where(at_j0, col_w, w_d1)
        # north predecessor (i-1, j): diag d-1 slot i-1
        p_n_nw = jnp.where(at_i0, top_nw, shiftL(nw_d1, NEG_INF))
        p_n_n = jnp.where(at_i0, top_n, shiftL(n_d1, NEG_INF))
        # northwest predecessor (i-1, j-1): diag d-2 slot i-1
        p_d_nw = jnp.where(at_i0, top_nw,
                           jnp.where(at_j0, colm1_nw, shiftL(nw_d2, NEG_INF)))
        p_d_n = jnp.where(at_i0, top_n,
                          jnp.where(at_j0, colm1_n, shiftL(n_d2, NEG_INF)))
        p_d_w = jnp.where(at_i0, top_w,
                          jnp.where(at_j0, colm1_w, shiftL(w_d2, NEG_INF)))

        # match score: 0 when either char is N (sw-full-cs.c:345-348)
        g = gdiag[:, None, :]
        ms = jnp.where((g == BASE_N) | (qr4 == BASE_N), 0,
                       jnp.where(g == qr4, m, x))

        TB = jnp.int32(NEG_INF)

        def layer(arr, l):
            return arr[:, l, :]

        # --- build each layer's candidates; static unroll over k ---
        # first-strict-max over ordered groups composes hierarchically:
        # precompute each source layer l's best (score, ptr) triple once
        # (shared by every destination layer), then each k picks over
        # [own triple..., M_l + ms_k + xp] — 4 shared 3-picks + 4 6-picks
        # instead of 4 12-picks per state (~30% fewer plane ops)
        s_nw_l, p_nw_l, s_n_l, p_n_l, s_w_l, p_w_l = [], [], [], [], [], []
        xpk = xp[:, 0, :]
        # per-source-layer maxima for the diagonal (NW-state) candidates;
        # the taboo guard is per-destination ROW (tok varies only with i,
        # not k — taboo_ok[:, k, :] is identical for all k): guard inside
        tok_row = taboo_ok[:, 0, :]

        def guard_row(v):
            # NOTE: the TB sentinel is applied BEFORE the per-k additive
            # terms (msk / xpk below), so a taboo candidate carries
            # TB + msk (+ xpk) rather than exactly TB.  This is a
            # deliberate tolerance: NEG_INF's ~2^28 margin dwarfs the
            # few-hundred-unit score offsets, so a taboo candidate can
            # never win a state (golden CS parity tests pin this).  If
            # NEG_INF is ever shrunk or many more penalty additions
            # accumulate on top of a guarded value, re-derive this bound.
            return jnp.where(tok_row, v, TB)

        M_d_f, M_d_r, M_n_f, M_n_r = [], [], [], []
        for l in range(4):
            fs, fp = pick([(layer(p_d_nw, l), _ptr(l, STATE_NW)),
                           (guard_row(layer(p_d_n, l)), _ptr(l, STATE_N)),
                           (layer(p_d_w, l), _ptr(l, STATE_W))])
            rs, rp = pick([(layer(p_d_w, l), _ptr(l, STATE_W)),
                           (guard_row(layer(p_d_n, l)), _ptr(l, STATE_N)),
                           (layer(p_d_nw, l), _ptr(l, STATE_NW))])
            M_d_f.append((fs, fp))
            M_d_r.append((rs, rp))
            fs, fp = pick([(guard_row(layer(p_n_nw, l) - boe),
                            _ptr(l, STATE_NW)),
                           (layer(p_n_n, l) - be, _ptr(l, STATE_N))])
            rs, rp = pick([(layer(p_n_n, l) - be, _ptr(l, STATE_N)),
                           (guard_row(layer(p_n_nw, l) - boe),
                            _ptr(l, STATE_NW))])
            M_n_f.append((fs, fp))
            M_n_r.append((rs, rp))

        def pick_pre(groups):
            """First-strict-max over (score, ptr_plane) groups in order."""
            s_best, p_best = groups[0]
            for s, p in groups[1:]:
                take = s > s_best
                s_best = jnp.where(take, s, s_best)
                p_best = jnp.where(take, p, p_best)
            return s_best, p_best

        for k in range(4):
            msk = ms[:, k, :]

            # NW state: own triple first, then other layers' maxima + xp
            fwd = [(M_d_f[k][0] + msk, M_d_f[k][1])]
            rev = [(M_d_r[k][0] + msk, M_d_r[k][1])]
            for l in cross_layers(k, range(4)):
                fwd.append((M_d_f[l][0] + msk + xpk, M_d_f[l][1]))
                rev.append((M_d_r[l][0] + msk + xpk, M_d_r[l][1]))
            fs, fp = pick_pre(fwd)
            rs, rp = pick_pre(rev)
            s_nw_l.append(jnp.where(rc[:, 0, :], rs, fs))
            p_nw_l.append(jnp.where(rc[:, 0, :], rp, fp))

            # N state (read char vs genome gap)
            fwd = [M_n_f[k]]
            rev = [M_n_r[k]]
            for l in cross_layers(k, range(4)):
                fwd.append((M_n_f[l][0] + xpk, M_n_f[l][1]))
                rev.append((M_n_r[l][0] + xpk, M_n_r[l][1]))
            fs, fp = pick_pre(fwd)
            rs, rp = pick_pre(rev)
            s_n_l.append(jnp.where(rc[:, 0, :], rs, fs))
            p_n_l.append(jnp.where(rc[:, 0, :], rp, fp))

            # W state (genome char vs read gap): same layer only
            fwd = [(guard_row(layer(p_w_nw, k) - aoe), _ptr(k, STATE_NW)),
                   (layer(p_w_w, k) - ae, _ptr(k, STATE_W))]
            rev = [(layer(p_w_w, k) - ae, _ptr(k, STATE_W)),
                   (guard_row(layer(p_w_nw, k) - aoe), _ptr(k, STATE_NW))]
            fs, fp = pick(fwd)
            rs, rp = pick(rev)
            s_w_l.append(jnp.where(rc[:, 0, :], rs, fs))
            p_w_l.append(jnp.where(rc[:, 0, :], rp, fp))

        s_nw = jnp.stack(s_nw_l, axis=1)
        p_nw = jnp.stack(p_nw_l, axis=1)
        s_n = jnp.stack(s_n_l, axis=1)
        p_n = jnp.stack(p_n_l, axis=1)
        s_w = jnp.stack(s_w_l, axis=1)
        p_w = jnp.stack(p_w_l, axis=1)

        if loc:
            # layer-dependent floors (resetval, sw-full-cs.c:355-358,438-441)
            reset = init_extra
            z = s_nw <= reset
            s_nw = jnp.where(z, reset, s_nw)
            p_nw = jnp.where(z, 0, p_nw)
            z = s_n <= reset
            s_n = jnp.where(z, reset, s_n)
            p_n = jnp.where(z, 0, p_n)
            z = s_w <= reset
            s_w = jnp.where(z, reset, s_w)
            p_w = jnp.where(z, 0, p_w)

        def to_border(s_nw, p_nw, s_n, p_n, s_w, p_w, outside):
            if loc:
                s_nw = jnp.where(outside, col_nw, s_nw)
                s_n = jnp.where(outside, col_n, s_n)
                s_w = jnp.where(outside, col_w, s_w)
            else:
                s_nw = jnp.where(outside, NEG_INF, s_nw)
                s_n = jnp.where(outside, NEG_INF, s_n)
                s_w = jnp.where(outside, NEG_INF, s_w)
            p_nw = jnp.where(outside, 0, p_nw)
            p_n = jnp.where(outside, 0, p_n)
            p_w = jnp.where(outside, 0, p_w)
            return s_nw, p_nw, s_n, p_n, s_w, p_w

        if band_xmin is not None:
            out_band = (jj < band_xmin[:, None, :]) | \
                       (jj > band_xmax[:, None, :])
            s_nw, p_nw, s_n, p_n, s_w, p_w = to_border(
                s_nw, p_nw, s_n, p_n, s_w, p_w, out_band)

        valid = (ii <= d) & (jj >= 0) & (ii < rlen[:, None, None]) & \
            (jj < glen[:, None, None])
        s_nw, p_nw, s_n, p_n, s_w, p_w = to_border(
            s_nw, p_nw, s_n, p_n, s_w, p_w, ~valid)

        # --- best-cell tracking: row-major-first strict max over (i,j,k),
        # state priority per strand (sw-full-cs.c:550-583) ---
        cell_fwd = [s_nw, s_n, s_w]
        cell_rev = [s_w, s_n, s_nw]
        cs0 = jnp.where(rc, cell_rev[0], cell_fwd[0])
        cs1 = jnp.where(rc, cell_rev[1], cell_fwd[1])
        cs2 = jnp.where(rc, cell_rev[2], cell_fwd[2])
        cell = jnp.maximum(jnp.maximum(cs0, cs1), cs2)    # [B, 4, R]
        eligible = valid if loc else (valid & (ii == rlen[:, None, None] - 1))
        cell = jnp.where(eligible, cell, NEG_INF)
        # reduce over layers (smaller k wins ties), then slots (smaller i)
        lane_best_k = jnp.argmax(cell, axis=1).astype(jnp.int32)  # [B, R]
        cell_bk = jnp.max(cell, axis=1)                           # [B, R]
        diag_best = jnp.max(cell_bk, axis=1)
        slot = jnp.argmax(cell_bk, axis=1).astype(jnp.int32)
        cand_i, cand_j = slot, d - slot
        cand_k = jnp.take_along_axis(lane_best_k, slot[:, None],
                                     axis=1)[:, 0]
        improved = (diag_best > best) | \
            ((diag_best == best) & (diag_best > 0) & (cand_i < best_i))
        best = jnp.where(improved, diag_best, best)
        best_i = jnp.where(improved, cand_i, best_i)
        best_j = jnp.where(improved, cand_j, best_j)
        best_k = jnp.where(improved, cand_k, best_k)
        sel = (jnp.arange(B), cand_k, slot)
        cand_states = jnp.stack([s_nw[sel], s_n[sel], s_w[sel]], axis=1)
        best_states = jnp.where(improved[:, None], cand_states, best_states)

        bits = (p_nw | (p_n << 4) | (p_w << 8)).astype(jnp.uint16)
        carry = (s_nw, nw_d1, s_n, n_d1, s_w, w_d1, gdiag,
                 best, best_i, best_j, best_k, best_states)
        return carry, bits

    carry0 = (nw_d1, nw_d2, n_d1, n_d2, w_d1, w_d2, gdiag,
              best, best_i, best_j, best_k, best_states)
    carry, bits = jax.lax.scan(step, carry0,
                               jnp.arange(n_diag, dtype=jnp.int32))
    (_, _, _, _, _, _, _, best, best_i, best_j, best_k, best_states) = carry
    return best, best_i, best_j, best_k, best_states, bits


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment",
                                    "taboo_len", "W"))
def sw_full_cs_batch_packed(genome_ls: jax.Array, qr4: jax.Array,
                            xover_row: jax.Array, revcmpl: jax.Array,
                            band_xmin: jax.Array, band_xmax: jax.Array,
                            params: SWParams = SWParams(),
                            local_alignment: bool = True,
                            taboo_len: int = 0,
                            W: int = 32):
    """Band-packed form of `sw_full_cs_batch` — bit-identical results.

    The banded 4-layer DP (sw-full-cs.c:327 banded row loop, README
    "necks":1415-1422) only has live cells at columns j in
    [band_xmin[i], band_xmax[i]]; this kernel stores row i in packed
    coordinates u = j - band_xmin[i] with static width W, scanning READ
    ROWS (R steps over [B, 4, W] planes) instead of anti-diagonals
    (G+R-1 steps over [B, 4, R]) — the CS port of
    `ops/sw_full.py::sw_full_batch_packed`.

    The port is possible because the W state (genome char vs read gap)
    accepts same-layer predecessors only ("it doesn't make sense to
    cross over on a genomic gap", sw-full-cs.c:535-538): the within-row
    recurrence W_k[j] = max(NW_k[j-1]-aoe, W_k[j-1]-ae) collapses into
    one tilted cummax PER LAYER over the floored NW row.  The layer
    floor (0 for k=0, the row's crossover penalty for k>0) is a row
    constant, so the LS exactness argument carries over unchanged: any
    path through a floored intermediate only decays (-ae < 0) and ends
    at or below the floor, which the final per-layer floor restores;
    pointers are recomputed per cell from the exact predecessor values.
    Cross-layer candidates exist only in the NW and N states, whose
    predecessors all live in the PREVIOUS row — plain shifted planes.

    Returns (score[B], best_i[B], best_j[B], best_k[B], states[B, 3],
    bits uint16 [R, B, 4, W]) with bits[i, b, k, j - band_xmin[b, i]]
    for cell (i, j, k).
    """
    genome_ls = genome_ls.astype(jnp.int32)
    qr4 = qr4.astype(jnp.int32)
    B, G = genome_ls.shape
    _, _, R = qr4.shape
    rc2 = revcmpl.astype(bool)[:, None]                    # [B, 1]
    rc3 = revcmpl.astype(bool)[:, None, None]              # [B, 1, 1]
    loc = bool(local_alignment)

    m = jnp.int32(params.match)
    x = jnp.int32(params.mismatch)
    aoe = jnp.int32(-(params.a_gap_open + params.a_gap_extend))
    ae = jnp.int32(-params.a_gap_extend)
    boe = jnp.int32(-(params.b_gap_open + params.b_gap_extend))
    be = jnp.int32(-params.b_gap_extend)
    a_go = jnp.int32(params.a_gap_open)                    # negative
    b_go = jnp.int32(params.b_gap_open)
    gxp = jnp.int32(params.crossover)

    rlen = jnp.sum(qr4[:, 0, :] >= 0, axis=1)              # [B]
    glen = jnp.sum(genome_ls >= 0, axis=1)

    uu = jnp.arange(W, dtype=jnp.int32)[None, :]           # [1, W]
    genome_p = jnp.pad(genome_ls, ((0, 0), (0, W + 1)),
                       constant_values=GENOME_PAD)
    tilt = ae * jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    k4 = jnp.arange(4, dtype=jnp.int32)[None, :]           # [1, 4]
    # virtual row -1: local-style init with the GLOBAL crossover
    # (sw-full-cs.c:266-268)
    top_nw = jnp.where(k4 == 0, 0, gxp).astype(jnp.int32)  # [1, 4]
    top_n = b_go + top_nw
    top_w = a_go + top_nw
    TB = jnp.int32(NEG_INF)

    SHIFT_PAD = 2
    while SHIFT_PAD < G:
        SHIFT_PAD <<= 1

    def shift_rows(P, d, border):
        """out[b, u] = P[b, u + d[b]] for d[b] >= 0, border beyond the
        right edge (log-decomposed static shifts — see sw_full.py)."""
        Wp_ = P.shape[1]
        if getattr(border, "ndim", 0):
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

    def pick(cands):
        """First-strict-max over ordered (score [B, W], ptr int) pairs."""
        s_best, p = cands[0]
        p_best = jnp.full_like(s_best, p)
        for s, p in cands[1:]:
            take = s > s_best
            s_best = jnp.where(take, s, s_best)
            p_best = jnp.where(take, p, p_best)
        return s_best, p_best

    def pick_pre(groups):
        """First-strict-max over (score, ptr_plane) groups in order."""
        s_best, p_best = groups[0]
        for s, p in groups[1:]:
            take = s > s_best
            s_best = jnp.where(take, s, s_best)
            p_best = jnp.where(take, p, p_best)
        return s_best, p_best

    def step(carry, xs):
        (nw_p, n_p, w_p, xmin_p, best, best_i, best_j, best_k,
         best_states, i) = carry
        xmin_c, xmax_c, rchar4, xp_c, xp_p = xs
        at_i0 = i == 0
        d = jnp.where(at_i0, 0, xmin_c - xmin_p)[:, None]  # [B, 1]

        # per-layer border values: current row (init_cell,
        # sw-full-cs.c:199-243) and previous row (diagonal preds)
        ie_c = jnp.where(k4 == 0, 0, xp_c[:, None])        # [B, 4]
        ie_p = jnp.where(k4 == 0, 0, xp_p[:, None])
        if loc:
            col_nw, col_n, col_w = ie_c, b_go + ie_c, a_go + ie_c
            cm1_nw, cm1_n, cm1_w = ie_p, b_go + ie_p, a_go + ie_p
        else:
            neg = jnp.full((B, 4), NEG_INF, jnp.int32)
            col_nw = col_n = col_w = neg
            cm1_nw = cm1_n = cm1_w = neg

        # previous-row planes in current-packed coordinates: one stacked
        # [12B, W] shift; the prepended border column makes out[:, :W]
        # the diagonal preds (u+d-1) and out[:, 1:] the north preds (u+d)
        T = jnp.concatenate([nw_p.reshape(4 * B, W),
                             n_p.reshape(4 * B, W),
                             w_p.reshape(4 * B, W)], axis=0)
        bor12 = jnp.concatenate([cm1_nw.reshape(4 * B, 1),
                                 cm1_n.reshape(4 * B, 1),
                                 cm1_w.reshape(4 * B, 1)], axis=0)
        d12 = jnp.tile(jnp.repeat(d, 4, axis=0), (3, 1))
        S = shift_rows(jnp.concatenate([bor12, T], axis=1), d12, bor12)
        S_d, S_n = S[:, :W], S[:, 1:]
        p_d_nw = S_d[:4 * B].reshape(B, 4, W)
        p_d_n = S_d[4 * B:8 * B].reshape(B, 4, W)
        p_d_w = S_d[8 * B:].reshape(B, 4, W)
        p_n_nw = S_n[:4 * B].reshape(B, 4, W)
        p_n_n = S_n[4 * B:8 * B].reshape(B, 4, W)
        # virtual row -1 overrides every border at i == 0
        t_nw = jnp.broadcast_to(top_nw[:, :, None], (B, 4, W))
        t_n = jnp.broadcast_to(top_n[:, :, None], (B, 4, W))
        t_w = jnp.broadcast_to(top_w[:, :, None], (B, 4, W))
        p_d_nw = jnp.where(at_i0, t_nw, p_d_nw)
        p_d_n = jnp.where(at_i0, t_n, p_d_n)
        p_d_w = jnp.where(at_i0, t_w, p_d_w)
        p_n_nw = jnp.where(at_i0, t_nw, p_n_nw)
        p_n_n = jnp.where(at_i0, t_n, p_n_n)

        jj = xmin_c[:, None] + uu                          # [B, W]
        gchar = shift_rows(genome_p, xmin_c[:, None],
                           jnp.int32(GENOME_PAD))[:, :W]
        g3 = gchar[:, None, :]
        q3 = rchar4[:, :, None]
        ms = jnp.where((g3 == BASE_N) | (q3 == BASE_N), 0,
                       jnp.where(g3 == q3, m, x))          # [B, 4, W]

        tok = (i < rlen - taboo_len)[:, None]              # [B, 1]

        def guard_row(v):
            # same sentinel tolerance as the full kernel's guard_row
            return jnp.where(tok, v, TB)

        def layer(arr, l):
            return arr[:, l, :]

        # hierarchical first-strict-max (see the full kernel): shared
        # per-source-layer maxima, then per-destination 6-picks
        M_d_f, M_d_r, M_n_f, M_n_r = [], [], [], []
        for l in range(4):
            fs, fp = pick([(layer(p_d_nw, l), _ptr(l, STATE_NW)),
                           (guard_row(layer(p_d_n, l)), _ptr(l, STATE_N)),
                           (layer(p_d_w, l), _ptr(l, STATE_W))])
            rs, rp = pick([(layer(p_d_w, l), _ptr(l, STATE_W)),
                           (guard_row(layer(p_d_n, l)), _ptr(l, STATE_N)),
                           (layer(p_d_nw, l), _ptr(l, STATE_NW))])
            M_d_f.append((fs, fp))
            M_d_r.append((rs, rp))
            fs, fp = pick([(guard_row(layer(p_n_nw, l) - boe),
                            _ptr(l, STATE_NW)),
                           (layer(p_n_n, l) - be, _ptr(l, STATE_N))])
            rs, rp = pick([(layer(p_n_n, l) - be, _ptr(l, STATE_N)),
                           (guard_row(layer(p_n_nw, l) - boe),
                            _ptr(l, STATE_NW))])
            M_n_f.append((fs, fp))
            M_n_r.append((rs, rp))

        xpk = xp_c[:, None]                                # [B, 1]
        s_nw_l, p_nw_l, s_n_l, p_n_l, s_w_l, p_w_l = [], [], [], [], [], []
        for k in range(4):
            msk = ms[:, k, :]
            reset = ie_c[:, k][:, None]                    # [B, 1]

            # --- NW state ---
            fwd = [(M_d_f[k][0] + msk, M_d_f[k][1])]
            rev = [(M_d_r[k][0] + msk, M_d_r[k][1])]
            for l in cross_layers(k, range(4)):
                fwd.append((M_d_f[l][0] + msk + xpk, M_d_f[l][1]))
                rev.append((M_d_r[l][0] + msk + xpk, M_d_r[l][1]))
            fs, fp = pick_pre(fwd)
            rs, rp = pick_pre(rev)
            s_nw = jnp.where(rc2, rs, fs)
            p_nw = jnp.where(rc2, rp, fp)
            if loc:
                z = s_nw <= reset
                s_nw = jnp.where(z, reset, s_nw)
                p_nw = jnp.where(z, 0, p_nw)

            # --- N state ---
            fwd = [M_n_f[k]]
            rev = [M_n_r[k]]
            for l in cross_layers(k, range(4)):
                fwd.append((M_n_f[l][0] + xpk, M_n_f[l][1]))
                rev.append((M_n_r[l][0] + xpk, M_n_r[l][1]))
            fs, fp = pick_pre(fwd)
            rs, rp = pick_pre(rev)
            s_n = jnp.where(rc2, rs, fs)
            p_n = jnp.where(rc2, rp, fp)
            if loc:
                z = s_n <= reset
                s_n = jnp.where(z, reset, s_n)
                p_n = jnp.where(z, 0, p_n)

            # --- W state: per-layer tilted cummax over the floored NW
            # row (taboo rows exclude every gap-open candidate, leaving
            # only the border-W extension chain) ---
            c_nw_k = col_nw[:, k][:, None]
            c_w_k = col_w[:, k][:, None]
            cand = jnp.concatenate([c_nw_k, s_nw], axis=1)  # [B, W+1]
            cand = jnp.where(tok, cand, TB)
            run = jax.lax.cummax(cand + tilt, axis=1)
            chain = run[:, :-1] - aoe - ae * uu
            w_border = c_w_k - ae * (uu + 1)
            s_w = jnp.maximum(chain, w_border)
            w_floored = jnp.maximum(s_w, reset) if loc else s_w
            nw_west = jnp.concatenate([c_nw_k, s_nw[:, :-1]], axis=1)
            w_west = jnp.concatenate([c_w_k, w_floored[:, :-1]], axis=1)
            cd_nw = jnp.where(tok, nw_west - aoe, TB)
            cd_w = w_west - ae
            p_w_f = jnp.where(cd_nw >= cd_w,
                              jnp.int32(_ptr(k, STATE_NW)),
                              jnp.int32(_ptr(k, STATE_W)))
            p_w_r = jnp.where(cd_w >= cd_nw,
                              jnp.int32(_ptr(k, STATE_W)),
                              jnp.int32(_ptr(k, STATE_NW)))
            p_w = jnp.where(rc2, p_w_r, p_w_f)
            if loc:
                z = s_w <= reset
                s_w = jnp.where(z, reset, s_w)
                p_w = jnp.where(z, 0, p_w)

            s_nw_l.append(s_nw)
            p_nw_l.append(p_nw)
            s_n_l.append(s_n)
            p_n_l.append(p_n)
            s_w_l.append(s_w)
            p_w_l.append(p_w)

        s_nw = jnp.stack(s_nw_l, axis=1)                   # [B, 4, W]
        p_nw = jnp.stack(p_nw_l, axis=1)
        s_n = jnp.stack(s_n_l, axis=1)
        p_n = jnp.stack(p_n_l, axis=1)
        s_w = jnp.stack(s_w_l, axis=1)
        p_w = jnp.stack(p_w_l, axis=1)

        # --- band-width + grid masking to the row border values (the
        # full kernel's to_border semantics for out-of-band/invalid) ---
        in_band = (uu <= (xmax_c - xmin_c)[:, None])       # [B, W]
        valid = in_band & (jj < glen[:, None]) & (i < rlen[:, None])
        outside = ~valid[:, None, :]                       # [B, 1, W]
        if loc:
            s_nw = jnp.where(outside, col_nw[:, :, None], s_nw)
            s_n = jnp.where(outside, col_n[:, :, None], s_n)
            s_w = jnp.where(outside, col_w[:, :, None], s_w)
        else:
            s_nw = jnp.where(outside, NEG_INF, s_nw)
            s_n = jnp.where(outside, NEG_INF, s_n)
            s_w = jnp.where(outside, NEG_INF, s_w)
        p_nw = jnp.where(outside, 0, p_nw)
        p_n = jnp.where(outside, 0, p_n)
        p_w = jnp.where(outside, 0, p_w)

        # --- best tracking: rows in order == row-major first-strict-max
        # over (i, j, k); layer reduce first (smaller k), then slot
        # (smaller u = smaller j) ---
        cs0 = jnp.where(rc3, s_w, s_nw)
        cs2 = jnp.where(rc3, s_nw, s_w)
        cell = jnp.maximum(jnp.maximum(cs0, s_n), cs2)
        eligible = (valid[:, None, :] if loc
                    else valid[:, None, :] & (i == rlen[:, None, None] - 1))
        cell = jnp.where(eligible, cell, NEG_INF)
        lane_best_k = jnp.argmax(cell, axis=1).astype(jnp.int32)
        cell_bk = jnp.max(cell, axis=1)                    # [B, W]
        row_best = jnp.max(cell_bk, axis=1)
        slot = jnp.argmax(cell_bk, axis=1).astype(jnp.int32)
        cand_k = jnp.take_along_axis(lane_best_k, slot[:, None],
                                     axis=1)[:, 0]
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, i, best_i)
        best_j = jnp.where(improved, xmin_c + slot, best_j)
        best_k = jnp.where(improved, cand_k, best_k)
        sel = (jnp.arange(B), cand_k, slot)
        cand_states = jnp.stack([s_nw[sel], s_n[sel], s_w[sel]], axis=1)
        best_states = jnp.where(improved[:, None], cand_states,
                                best_states)

        bits = (p_nw | (p_n << 4) | (p_w << 8)).astype(jnp.uint16)
        return (s_nw, s_n, s_w, xmin_c, best, best_i, best_j, best_k,
                best_states, i + 1), bits

    plane = lambda: jnp.full((B, 4, W), NEG_INF, jnp.int32)
    zeros = jnp.zeros(B, jnp.int32)
    carry0 = (plane(), plane(), plane(), zeros, zeros, zeros, zeros,
              zeros, jnp.zeros((B, 3), jnp.int32), jnp.int32(0))
    xp_all = xover_row.astype(jnp.int32)
    xp_prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), xp_all[:, :-1]], axis=1)
    xs = (band_xmin.astype(jnp.int32).T, band_xmax.astype(jnp.int32).T,
          qr4.transpose(2, 0, 1), xp_all.T, xp_prev.T)
    carry, bits = jax.lax.scan(step, carry0, xs)
    (_, _, _, _, best, best_i, best_j, best_k, best_states, _) = carry
    return best, best_i, best_j, best_k, best_states, bits


@jax.jit
def traceback_cs_batch_packed_jax(bits: jax.Array, band_xmin: jax.Array,
                                  bi: jax.Array, bj: jax.Array,
                                  bk: jax.Array, states: jax.Array,
                                  genome_ls: jax.Array, qr4: jax.Array,
                                  score: jax.Array):
    """On-device traceback over the packed (R, B, 4, W) bits plane; cell
    (i, j, k) lives at bits[i, b, k, j - band_xmin[b, i]].  Same walk
    and outputs as `traceback_cs_batch_jax`."""
    R_, B, _, W = bits.shape
    G = genome_ls.shape[1]
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

    genome32 = genome_ls.astype(jnp.int32)
    qr32 = qr4.astype(jnp.int32)

    # while_loop with an all-lanes-inactive early exit (see the LS
    # packed traceback): walks end after ~rlen steps, not R+G
    def cond(c):
        return c[-1]

    def body(c):
        (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo, nops,
         ops_buf, step, _) = c
        ii = jnp.clip(i, 0, R_ - 1)
        jj = jnp.clip(j, 0, G - 1)
        # out-of-band predecessors carry pointer 0 in the full-grid
        # plane (walk stops) — replicate outside the packed band
        u_raw = jj - xmin[lanes, ii]
        inb = (u_raw >= 0) & (u_raw < W)
        cell = jnp.where(
            inb, bits[ii, lanes, k, jnp.clip(u_raw, 0, W - 1)],
            jnp.uint16(0)).astype(jnp.int32)
        ptr = jnp.where(st == STATE_NW, cell & 15,
                        jnp.where(st == STATE_N, (cell >> 4) & 15,
                                  (cell >> 8) & 15))
        step_active = active & (ptr != 0)
        src_layer = (ptr - 1) // 3
        src_state = (ptr - 1) % 3

        is_nw = step_active & (st == STATE_NW)
        is_n = step_active & (st == STATE_N)
        is_w = step_active & (st == STATE_W)
        xover = step_active & (src_layer != k)

        gch = genome32[lanes, jj]
        qch = qr32[lanes, k, ii]
        eq = (gch == qch) | (gch == BASE_N) | (qch == BASE_N)
        mt = mt + (is_nw & eq)
        mm = mm + (is_nw & ~eq)
        dl = dl + is_n
        ins = ins + is_w
        xo = xo + xover
        rs = jnp.where(is_nw | is_n, i, rs)
        gs = jnp.where(is_nw | is_w, j, gs)

        op = (jnp.where(is_n, OP_DEL, jnp.where(is_w, OP_INS, OP_MATCH))
              | (k << 2)
              | jnp.where(xover, OP_XOVER, 0)).astype(jnp.uint8)
        nops = nops + step_active

        i = i - (is_nw | is_n)
        j = j - (is_nw | is_w)
        k = jnp.where(step_active, src_layer, k)
        st = jnp.where(step_active, src_state, st)
        active = step_active & (i >= 0) & (j >= 0)
        ops_buf = jax.lax.dynamic_update_slice(ops_buf, op[None, :],
                                               (step, 0))
        cont = jnp.any(active) & (step + 1 < max_steps)
        return (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo, nops,
                ops_buf, step + 1, cont)

    zeros = jnp.zeros(B, jnp.int32)
    carry0 = (bi.astype(jnp.int32), bj.astype(jnp.int32),
              bk.astype(jnp.int32), state, score > 0,
              zeros, zeros, zeros, zeros, zeros, zeros, zeros, zeros,
              jnp.zeros((max_steps, B), jnp.uint8), jnp.int32(0),
              jnp.any(score > 0))
    (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo, nops, ops_steps,
     _, _) = jax.lax.while_loop(cond, body, carry0)
    ops = ops_steps.T

    kidx = jnp.arange(max_steps)[None, :]
    src = jnp.clip(nops[:, None] - 1 - kidx, 0, max_steps - 1)
    ops_rev = jnp.take_along_axis(ops, src, axis=1)
    ops_rev = jnp.where(kidx < nops[:, None], ops_rev, 0).astype(jnp.uint8)

    final_x = (k != 0) & (nops > 0)
    first = ops_rev[:, 0] | jnp.where(final_x, OP_XOVER, 0).astype(jnp.uint8)
    ops_rev = jnp.concatenate([first[:, None], ops_rev[:, 1:]], axis=1)
    xo = xo + final_x

    return {
        "read_start": rs, "genome_start": gs,
        "matches": mt, "mismatches": mm,
        "insertions": ins, "deletions": dl, "crossovers": xo,
        "rmapped": mt + mm + dl, "gmapped": mt + mm + ins,
        "ops": ops_rev, "ops_len": nops,
    }


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment",
                                    "taboo_len", "W"))
def sw_full_cs_and_traceback_packed_jax(genome_ls: jax.Array,
                                        qr4: jax.Array,
                                        xover_row: jax.Array,
                                        revcmpl: jax.Array,
                                        band_xmin: jax.Array,
                                        band_xmax: jax.Array,
                                        params: SWParams = SWParams(),
                                        local_alignment: bool = True,
                                        taboo_len: int = 0,
                                        W: int = 32):
    """Band-packed CS DP + traceback in one dispatch; same (stats, ops)
    contract as `sw_full_cs_and_traceback_jax`, bit-identical outputs."""
    score, bi, bj, bk, states, bits = sw_full_cs_batch_packed(
        genome_ls, qr4, xover_row, revcmpl, band_xmin, band_xmax,
        params, local_alignment, taboo_len, W)
    tb = traceback_cs_batch_packed_jax(bits, band_xmin, bi, bj, bk,
                                       states, genome_ls, qr4, score)
    stats = jnp.stack([
        score, tb["read_start"], tb["genome_start"], tb["matches"],
        tb["mismatches"], tb["insertions"], tb["deletions"], tb["rmapped"],
        tb["gmapped"], tb["ops_len"], tb["crossovers"]], axis=1
    ).astype(jnp.int32)
    return stats, tb["ops"]


@jax.jit
def traceback_cs_batch_jax(bits: jax.Array, bi: jax.Array, bj: jax.Array,
                           bk: jax.Array, states: jax.Array,
                           genome_ls: jax.Array, qr4: jax.Array,
                           score: jax.Array):
    """On-device traceback of the 4-layer pointers (do_backtrace,
    sw-full-cs.c:630-940).

    Returns a dict of per-lane arrays plus `ops` uint8 [B, max_steps]
    front-aligned, each op = type | layer<<2 | crossover<<4.
    """
    n_diag, B, _, R = bits.shape
    G = genome_ls.shape[1]
    max_steps = R + G
    lanes = jnp.arange(B)

    # start state: NW, replaced by W then N on strictly-greater (:643-651)
    s_nw, s_n, s_w = states[:, 0], states[:, 1], states[:, 2]
    state = jnp.full(B, STATE_NW, jnp.int32)
    best = s_nw
    take = s_w > best
    state = jnp.where(take, STATE_W, state)
    best = jnp.where(take, s_w, best)
    state = jnp.where(s_n > best, STATE_N, state)

    genome32 = genome_ls.astype(jnp.int32)
    qr32 = qr4.astype(jnp.int32)

    def step(carry, _):
        (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo, nops) = carry
        ii = jnp.clip(i, 0, R - 1)
        jj = jnp.clip(j, 0, G - 1)
        cell = bits[jnp.clip(ii + jj, 0, n_diag - 1), lanes, k, ii]
        cell = cell.astype(jnp.int32)
        ptr = jnp.where(st == STATE_NW, cell & 15,
                        jnp.where(st == STATE_N, (cell >> 4) & 15,
                                  (cell >> 8) & 15))
        step_active = active & (ptr != 0)
        src_layer = (ptr - 1) // 3
        src_state = (ptr - 1) % 3

        is_nw = step_active & (st == STATE_NW)
        is_n = step_active & (st == STATE_N)
        is_w = step_active & (st == STATE_W)
        xover = step_active & (src_layer != k)

        gch = genome32[lanes, jj]
        qch = qr32[lanes, k, ii]
        eq = (gch == qch) | (gch == BASE_N) | (qch == BASE_N)
        mt = mt + (is_nw & eq)
        mm = mm + (is_nw & ~eq)
        dl = dl + is_n          # read char vs genome gap ("deletion")
        ins = ins + is_w
        xo = xo + xover
        rs = jnp.where(is_nw | is_n, i, rs)
        gs = jnp.where(is_nw | is_w, j, gs)

        op = (jnp.where(is_n, OP_DEL, jnp.where(is_w, OP_INS, OP_MATCH))
              | (k << 2)
              | jnp.where(xover, OP_XOVER, 0)).astype(jnp.uint8)
        nops = nops + step_active

        i = i - (is_nw | is_n)
        j = j - (is_nw | is_w)
        k = jnp.where(step_active, src_layer, k)
        st = jnp.where(step_active, src_state, st)
        active = step_active & (i >= 0) & (j >= 0)
        return (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo, nops), op

    zeros = jnp.zeros(B, jnp.int32)
    carry0 = (bi.astype(jnp.int32), bj.astype(jnp.int32),
              bk.astype(jnp.int32), state, score > 0,
              zeros, zeros, zeros, zeros, zeros, zeros, zeros, zeros)
    (i, j, k, st, active, rs, gs, mt, mm, ins, dl, xo,
     nops), ops_steps = jax.lax.scan(step, carry0, None, length=max_steps)
    ops = ops_steps.T

    # reverse each lane's emitted prefix (walk emits back-to-front)
    kidx = jnp.arange(max_steps)[None, :]
    src = jnp.clip(nops[:, None] - 1 - kidx, 0, max_steps - 1)
    ops_rev = jnp.take_along_axis(ops, src, axis=1)
    ops_rev = jnp.where(kidx < nops[:, None], ops_rev, 0).astype(jnp.uint8)

    # final crossover: alignment beginning in a non-primary layer costs one
    # more crossover, flagged on the first column (:935-939)
    final_x = (k != 0) & (nops > 0)
    first = ops_rev[:, 0] | jnp.where(final_x, OP_XOVER, 0).astype(jnp.uint8)
    ops_rev = jnp.concatenate([first[:, None], ops_rev[:, 1:]], axis=1)
    xo = xo + final_x

    return {
        "read_start": rs, "genome_start": gs,
        "matches": mt, "mismatches": mm,
        "insertions": ins, "deletions": dl, "crossovers": xo,
        "rmapped": mt + mm + dl, "gmapped": mt + mm + ins,
        "ops": ops_rev, "ops_len": nops,
    }


@functools.partial(jax.jit,
                   static_argnames=("params", "local_alignment", "taboo_len"))
def sw_full_cs_and_traceback_jax(genome_ls: jax.Array, qr4: jax.Array,
                                 xover_row: jax.Array, revcmpl: jax.Array,
                                 params: SWParams = SWParams(),
                                 local_alignment: bool = True,
                                 taboo_len: int = 0,
                                 band_xmin: jax.Array | None = None,
                                 band_xmax: jax.Array | None = None):
    """Fused CS DP + traceback in one dispatch.

    Returns (stats int32 [B, 11], ops uint8 [B, R+G]); stats columns are
    (score, read_start, genome_start, matches, mismatches, insertions,
    deletions, rmapped, gmapped, ops_len, crossovers)."""
    score, bi, bj, bk, states, bits = sw_full_cs_batch(
        genome_ls, qr4, xover_row, revcmpl, params, local_alignment,
        taboo_len, band_xmin, band_xmax)
    tb = traceback_cs_batch_jax(bits, bi, bj, bk, states, genome_ls, qr4,
                                score)
    stats = jnp.stack([
        score, tb["read_start"], tb["genome_start"], tb["matches"],
        tb["mismatches"], tb["insertions"], tb["deletions"], tb["rmapped"],
        tb["gmapped"], tb["ops_len"], tb["crossovers"]], axis=1
    ).astype(jnp.int32)
    return stats, tb["ops"]


def render_alignment_cs(ops: np.ndarray, genome_row: np.ndarray,
                        qr4_row: np.ndarray, genome_start: int,
                        read_start: int) -> tuple[str, str]:
    """dbalign/qralign from the op array (pretty_print, sw-full-cs.c:948-1070).

    genome_row is the letter-space window; qr4_row is [4, R] letter decodings.
    Crossover columns render lowercase; an N read letter in a match column is
    replaced by the genome letter (same case rule)."""
    from shrimp_tpu import dna

    ops = np.asarray(ops, dtype=np.int32)
    typ = ops & 3
    k = (ops >> 2) & 3
    xov = (ops & OP_XOVER) != 0
    consumes_g = typ != OP_DEL
    consumes_r = typ != OP_INS
    gi = int(genome_start) + np.cumsum(consumes_g) - consumes_g
    ri = int(read_start) + np.cumsum(consumes_r) - consumes_r
    gcode = np.asarray(genome_row)[np.minimum(gi, len(genome_row) - 1)] & 15
    dch = dna.LS_CHARS[gcode]
    dch = np.where(consumes_g, dch, np.uint8(ord("-")))
    qr4_row = np.asarray(qr4_row)
    qcode = qr4_row[k, np.minimum(ri, qr4_row.shape[1] - 1)] & 15
    # N read letters in match columns copy the genome letter
    qcode = np.where((typ == OP_MATCH) & (qcode == 15), gcode, qcode)
    qch = dna.LS_CHARS[qcode]
    qch = np.where(xov, qch + 32, qch)           # lowercase crossovers
    qch = np.where(consumes_r, qch, np.uint8(ord("-")))
    return (dch.astype(np.uint8).tobytes().decode("ascii"),
            qch.astype(np.uint8).tobytes().decode("ascii"))


# ---------------------------------------------------------------------------
# NumPy oracle — scalar replication of full_sw (sw-full-cs.c:245-628)
# ---------------------------------------------------------------------------
@dataclass
class CSAlignment:
    score: int = 0
    read_start: int = 0
    genome_start: int = 0
    rmapped: int = 0
    gmapped: int = 0
    matches: int = 0
    mismatches: int = 0
    insertions: int = 0
    deletions: int = 0
    crossovers: int = 0
    dbalign: str = ""
    qralign: str = ""
    ops: np.ndarray = field(default_factory=lambda: np.zeros(0, np.uint8))


def sw_full_cs_numpy(genome_ls, qr4, xover_row, revcmpl: bool,
                     params: SWParams = SWParams(),
                     local_alignment: bool = True,
                     taboo_len: int = 0,
                     band_xmin=None, band_xmax=None) -> CSAlignment:
    """Scalar oracle for one (window, read) pair; mirrors the reference
    full_sw + do_backtrace + pretty_print cell for cell."""
    from shrimp_tpu import dna

    G = len(genome_ls)
    R = qr4.shape[1]
    m, x = params.match, params.mismatch
    aoe = -(params.a_gap_open + params.a_gap_extend)
    ae = -params.a_gap_extend
    boe = -(params.b_gap_open + params.b_gap_extend)
    be = -params.b_gap_extend
    a_go, b_go = params.a_gap_open, params.b_gap_open
    gxp = params.crossover
    loc = local_alignment

    # score[i][j][k][state], ptr likewise; virtual rows/cols -1 included
    S = np.full((R + 1, G + 1, 4, 3), NEG_INF, np.int64)
    P = np.zeros((R + 1, G + 1, 4), np.int32)

    def init_cell(i1, j1, local, xpen):
        for k in range(4):
            e = 0 if k == 0 else xpen
            if local:
                S[i1, j1, k] = (e, b_go + e, a_go + e)
            else:
                S[i1, j1, k] = (NEG_INF, NEG_INF, NEG_INF)
            P[i1, j1, k] = 0

    for j1 in range(G + 1):
        init_cell(0, j1, True, gxp)

    best = 0
    bi = bj = bk = 0
    for i in range(R):
        xpen = int(xover_row[i])
        x_min = 0 if band_xmin is None else int(band_xmin[i])
        x_max = G - 1 if band_xmax is None else int(band_xmax[i])
        init_cell(i + 1, x_min, loc, xpen)   # left border (col x_min-1)
        tok = i < R - taboo_len
        for j in range(x_min, x_max + 1):
            for k in range(4):
                reset = 0 if k == 0 else xpen
                g = int(genome_ls[j])
                q = int(qr4[k, i])
                ms = 0 if (g == BASE_N or q == BASE_N) else (m if g == q else x)

                def pick(cands):
                    bs, bp = cands[0]
                    for s, p in cands[1:]:
                        if s > bs:
                            bs, bp = s, p
                    return bs, bp

                # NW
                pd = S[i, j]     # (i-1, j-1) incl borders
                same = [(pd[k][0] + ms, _ptr(k, 0))]
                if tok:
                    same.append((pd[k][1] + ms, _ptr(k, 1)))
                same.append((pd[k][2] + ms, _ptr(k, 2)))
                cross = []
                for l in range(4):
                    if l == k:
                        continue
                    cl = [(pd[l][0] + ms + xpen, _ptr(l, 0))]
                    if tok:
                        cl.append((pd[l][1] + ms + xpen, _ptr(l, 1)))
                    cl.append((pd[l][2] + ms + xpen, _ptr(l, 2)))
                    cross.extend(cl if not revcmpl else cl[::-1])
                cands = (same if not revcmpl else same[::-1]) + cross
                s_nw, p_nw = pick(cands)
                if loc and s_nw <= reset:
                    s_nw, p_nw = reset, 0

                # N
                pn = S[i, j + 1]   # (i-1, j)
                # forward: default nw-boe then n-be strictly greater or taboo
                if not revcmpl:
                    c = [(pn[k][0] - boe if tok else NEG_INF, _ptr(k, 0)),
                         (pn[k][1] - be, _ptr(k, 1))]
                else:
                    c = [(pn[k][1] - be, _ptr(k, 1)),
                         (pn[k][0] - boe if tok else NEG_INF, _ptr(k, 0))]
                for l in range(4):
                    if l == k:
                        continue
                    cl = [(pn[l][0] - boe + xpen if tok else NEG_INF,
                           _ptr(l, 0)),
                          (pn[l][1] - be + xpen, _ptr(l, 1))]
                    c.extend(cl if not revcmpl else cl[::-1])
                s_n, p_n = pick(c)
                if loc and s_n <= reset:
                    s_n, p_n = reset, 0

                # W
                pw = S[i + 1, j]   # (i, j-1)
                if not revcmpl:
                    c = [(pw[k][0] - aoe if tok else NEG_INF, _ptr(k, 0)),
                         (pw[k][2] - ae, _ptr(k, 2))]
                else:
                    c = [(pw[k][2] - ae, _ptr(k, 2)),
                         (pw[k][0] - aoe if tok else NEG_INF, _ptr(k, 0))]
                s_w, p_w = pick(c)
                if loc and s_w <= reset:
                    s_w, p_w = reset, 0

                S[i + 1, j + 1, k] = (s_nw, s_n, s_w)
                P[i + 1, j + 1, k] = (p_nw | (p_n << 4) | (p_w << 8))

                if loc or i == R - 1:
                    order = ((s_nw, 0), (s_n, 1), (s_w, 2)) if not revcmpl \
                        else ((s_w, 2), (s_n, 1), (s_nw, 0))
                    for s, _st in order:
                        if s > best:
                            best, bi, bj, bk = s, i, j, k
        if i + 1 < R:
            nxt_max = G - 1 if band_xmax is None else int(band_xmax[i + 1])
            for j in range(x_max + 1, nxt_max + 1):
                init_cell(i + 1, j + 1, loc, xpen)

    res = CSAlignment(score=int(best))
    if best <= 0:
        return res

    # traceback
    i, j, k = bi, bj, bk
    cell = S[i + 1, j + 1, k]
    pcell = P[i + 1, j + 1, k]
    frm_state = STATE_NW
    fscore = cell[0]
    if cell[2] > fscore:
        frm_state, fscore = STATE_W, cell[2]
    if cell[1] > fscore:
        frm_state = STATE_N
    ptr = (pcell >> (4 * frm_state)) & 15

    cols = []   # (type, layer, xover)
    while i >= 0 and j >= 0:
        cur = frm_state
        l = (ptr - 1) // 3
        src = (ptr - 1) % 3
        xov = l != k
        if cur == STATE_N:
            res.deletions += 1
            res.read_start = i
            typ = OP_DEL
        elif cur == STATE_W:
            res.insertions += 1
            res.genome_start = j
            typ = OP_INS
        else:
            g, q = int(genome_ls[j]), int(qr4[k, i])
            if g == q or g == BASE_N or q == BASE_N:
                res.matches += 1
            else:
                res.mismatches += 1
            res.read_start = i
            res.genome_start = j
            typ = OP_MATCH
        cols.append([typ, k, xov])
        if xov:
            res.crossovers += 1
        k = l
        if cur == STATE_NW or cur == STATE_N:
            i -= 1
        if cur == STATE_NW or cur == STATE_W:
            j -= 1
        frm_state = src
        ptr = (int(P[i + 1, j + 1, k]) >> (4 * src)) & 15
        if ptr == 0:
            break

    if k != 0:
        cols[-1][2] = True
        res.crossovers += 1
    cols.reverse()
    res.rmapped = res.matches + res.mismatches + res.deletions
    res.gmapped = res.matches + res.mismatches + res.insertions
    res.ops = np.array(
        [t | (kk_ << 2) | (OP_XOVER if xv else 0) for t, kk_, xv in cols],
        np.uint8)
    res.dbalign, res.qralign = render_alignment_cs(
        res.ops, genome_ls, qr4, res.genome_start, res.read_start)
    return res

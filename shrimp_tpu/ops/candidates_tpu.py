"""On-device candidate generation — L3 of the funnel as one XLA program.

The reference walks per-read posting lists with heaps and a diag-modulo
cache (`gmapper/mapping.c:963-1184`).  The TPU-native reformulation
(SURVEY.md §7.4) makes every stage a fixed-shape masked array op so the
whole batch flows through one jitted program:

  kmer extraction      one strided gather per seed            [B, K]
  posting expansion    CSR gather with a fixed per-kmer cap   [B, K, CAP]
  anchor sort          jnp.sort on packed (x) keys            [B, A]
  diagonal collapse    segment heads on (diag, x)-sorted keys [B, A]
  window pairing       static-lookback shifted max            [B, A]
  window emission      threshold mask + lax.top_k             [B, N_OUT]

Capacity knobs (`cap`, `n_out`, `lookback`) bound every intermediate;
entries beyond a cap are dropped and counted (the `list_cutoff` stance:
heavy-tailed lists are trimmed, mapping.c:475-557 / genome.c:1188).  With
caps large enough to hold everything, the emitted window set equals the
host path's (`pipeline/candidates_batch.py`) — tested in
tests/test_candidates_tpu.py.

This module has no Python-level per-read work: everything is traced once
and runs on device, so it shards over a (reads x genome) mesh with
`shard_map` (see `parallel/shard.py::sharded_end_to_end_step`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID_X = jnp.int32(0x7FFFFFF0)   # sentinel > any genome position


class DeviceIndex(NamedTuple):
    """One genome shard's CSR index as device arrays.

    offsets[sn]: int32 [n_keys+1]; positions[sn]: int32 [n_postings_padded]
    (padded tail never dereferenced: offsets stop before it).
    spans / ones: static python tuples (trace-time constants).
    """

    offsets: tuple
    positions: tuple
    spans: tuple            # seed spans
    ones: tuple             # tuple of tuples: '1' offsets per seed
    genome: jax.Array       # int8 [G_shard] base codes (one strand plane)

    @staticmethod
    def from_host(idx, strand_plane: np.ndarray | None = None):
        """Lift a host GenomeIndex (single shard) onto the device."""
        offs = tuple(jnp.asarray(o.astype(np.int32)) for o in idx.offsets)
        poss = tuple(jnp.asarray(p.astype(np.int32)) for p in idx.positions)
        spans = tuple(int(s.span) for s in idx.seed_set.seeds)
        ones = tuple(tuple(int(o) for o in s.ones_idx)
                     for s in idx.seed_set.seeds)
        genome = jnp.asarray(idx.genome if strand_plane is None
                             else strand_plane)
        return DeviceIndex(offs, poss, spans, ones, genome)


def _mapidx_one_seed(codes: jax.Array, rlen: jax.Array, span: int,
                     ones: tuple, use_hashing: bool) -> jax.Array:
    """Kmer ids for one seed: uint32 [B, K] with 0xFFFFFFFF invalid."""
    B, R = codes.shape
    K = max(R - span + 1, 0)
    if K == 0:
        return jnp.full((B, 0), 0xFFFFFFFF, jnp.uint32)
    starts = jnp.arange(K)
    acc = jnp.zeros((B, K), jnp.uint32)
    c32 = codes.astype(jnp.uint32)
    for k, o in enumerate(ones):
        col = c32[:, o:o + K] if o + K <= R else jnp.pad(
            c32[:, o:], ((0, 0), (0, o + K - R)))
        acc = acc | ((col & 3) << (2 * k))
    valid = (starts[None, :] + span) <= rlen[:, None]
    if use_hashing:
        raise NotImplementedError(
            "-H hashed seeds use 64-bit mixing; keep them on the host path")
    return jnp.where(valid, acc, jnp.uint32(0xFFFFFFFF))


@functools.partial(
    jax.jit,
    static_argnames=("spans", "ones", "use_hashing", "cap", "n_out",
                     "lookback", "list_cutoff", "window_len", "match",
                     "b_gap_open", "b_gap_extend", "threshold_pct",
                     "collapse", "genome_len"))
def candidate_windows(codes: jax.Array, rlen: jax.Array,
                      offsets: tuple, positions: tuple,
                      spans: tuple, ones: tuple,
                      use_hashing: bool = False,
                      cap: int = 8, n_out: int = 16, lookback: int = 8,
                      list_cutoff: int = 0x7FFFFFFF,
                      window_len: int = 70,
                      genome_len: int = 1 << 26,
                      match: int = 10, b_gap_open: int = -290,
                      b_gap_extend: int = -55,
                      threshold_pct: float = 55.0,
                      collapse: bool = True):
    """Whole-batch candidate-window generation on device.

    Args:
      codes: int8 [B, R] read base codes for one strand.
      rlen:  int32 [B] read lengths.
      offsets/positions: the DeviceIndex CSR arrays.
      cap: max postings taken per (read, kmer) — overflow is counted.
      n_out: windows emitted per read (top-k by the window-gen score).
      lookback: max anchors considered for the 2-anchor window pairing.
      window_len: candidate window length (bases).

    Returns dict with
      g_off   int32 [B, n_out]  window starts (shard-local; -1 invalid)
      score   int32 [B, n_out]  window-gen scores (-1 invalid)
      n       int32 [B]         valid windows per read
      dropped int32 []          postings dropped by the per-kmer cap
    """
    B, R = codes.shape
    n_seeds = len(spans)

    xs_parts, ys_parts, dropped = [], [], jnp.int32(0)
    for sn in range(n_seeds):
        mi = _mapidx_one_seed(codes, rlen, spans[sn], ones[sn], use_hashing)
        K = mi.shape[1]
        if K == 0:
            continue
        valid = mi != jnp.uint32(0xFFFFFFFF)
        mi_safe = jnp.where(valid, mi, 0).astype(jnp.int32)
        lo = offsets[sn][mi_safe]
        hi = offsets[sn][mi_safe + 1]
        ln = jnp.where(valid, hi - lo, 0)
        ln = jnp.where(ln > list_cutoff, 0, ln)       # -z trimming
        take = jnp.minimum(ln, cap)
        dropped = dropped + jnp.sum(ln - take)
        j = jnp.arange(cap)
        src = jnp.minimum(lo[:, :, None] + j[None, None, :],
                          positions[sn].shape[0] - 1)
        x = positions[sn][src]                        # [B, K, cap]
        ok = j[None, None, :] < take[:, :, None]
        x = jnp.where(ok, x, INVALID_X)
        y = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                             x.shape)
        xs_parts.append((x.reshape(B, -1), y.reshape(B, -1),
                         jnp.full((B, K * cap), spans[sn], jnp.int32)))

    x = jnp.concatenate([p[0] for p in xs_parts], axis=1)
    y = jnp.concatenate([p[1] for p in xs_parts], axis=1)
    ln = jnp.concatenate([p[2] for p in xs_parts], axis=1)
    A = x.shape[1]
    valid = x < INVALID_X

    if collapse:
        # ---- diagonal collapse: stable two-key sort (x, then diag); runs
        # on the same diag merge into their head with summed weight and
        # extended length ----
        diag = jnp.where(valid, x - y, INVALID_X)
        order1 = jnp.argsort(jnp.where(valid, x, INVALID_X), axis=1,
                             stable=True)
        dg1 = jnp.take_along_axis(diag, order1, axis=1)
        order2 = jnp.argsort(dg1, axis=1, stable=True)
        order = jnp.take_along_axis(order1, order2, axis=1)
        xs = jnp.take_along_axis(x, order, axis=1)
        ys = jnp.take_along_axis(y, order, axis=1)
        lns = jnp.take_along_axis(ln, order, axis=1)
        dg = jnp.take_along_axis(diag, order, axis=1)
        vs = jnp.take_along_axis(valid, order, axis=1)
        head = jnp.ones((B, A), bool)
        head = head.at[:, 1:].set(dg[:, 1:] != dg[:, :-1])
        seg = jnp.cumsum(head, axis=1) - 1            # [B, A] run ids
        ends = xs + lns                               # run extent candidates
        # per-row segment aggregates via sorted-order scans
        ones_ = jnp.where(vs, 1, 0)

        def row_agg(seg_r, w_r, e_r):
            wt = jax.ops.segment_sum(w_r, seg_r, num_segments=A)
            ex = jax.ops.segment_max(e_r, seg_r, num_segments=A)
            return wt, ex

        wt_seg, ex_seg = jax.vmap(row_agg)(seg, ones_,
                                           jnp.where(vs, ends, -1))
        wt = wt_seg[jnp.arange(B)[:, None], seg]      # broadcast to rows
        ex = ex_seg[jnp.arange(B)[:, None], seg]
        keep = head & vs
        x = jnp.where(keep, xs, INVALID_X)
        y = jnp.where(keep, ys, 0)
        ln = jnp.where(keep, ex - xs, 0)
        wt_a = jnp.where(keep, wt, 0)
        valid = keep
    else:
        wt_a = jnp.where(valid, 1, 0)

    # ---- re-sort by x (window pairing walks anchors in x order) ----
    order = jnp.argsort(jnp.where(valid, x, INVALID_X), axis=1)
    x = jnp.take_along_axis(x, order, axis=1)
    y = jnp.take_along_axis(y, order, axis=1)
    ln = jnp.take_along_axis(ln, order, axis=1)
    wt_a = jnp.take_along_axis(wt_a, order, axis=1)
    valid = x < INVALID_X

    # ---- 2-anchor window pairing with static lookback
    # (mapping.c:1121-1184's backward scan, vectorized as k shifts) ----
    max_score = jnp.where(valid, ln * match, -(1 << 30))
    n_matches = wt_a
    best_j_x = x                                      # window-floor anchor
    for k in range(1, lookback + 1):
        xj = jnp.pad(x[:, :-k], ((0, 0), (k, 0)),
                     constant_values=INVALID_X)
        yj = jnp.pad(y[:, :-k], ((0, 0), (k, 0)))
        wj = jnp.pad(wt_a[:, :-k], ((0, 0), (k, 0)))
        # reference window floor (mapping.c:1128-1131): anchors at or after
        # gstart = clamp(x_i + rlen - 1 - y_i, <= genome_len-1) - window_len
        gend = jnp.minimum(x + rlen[:, None] - 1 - y, genome_len - 1)
        gstart = jnp.maximum(gend - window_len, 0)
        in_win = (xj < INVALID_X) & (xj >= gstart) & (yj < y)
        dx = x - xj
        dy = y - yj
        del_in_read = dx - dy > 0
        short_len = jnp.where(del_in_read, dy, dx) + ln
        long_len = jnp.where(del_in_read, dx, dy) + ln
        tmp = short_len * match + jnp.where(
            long_len > short_len,
            b_gap_open + (long_len - short_len) * b_gap_extend, 0)
        better = in_win & (tmp > max_score)
        max_score = jnp.where(better, tmp, max_score)
        n_matches = jnp.where(better, wt_a + wj, n_matches)
        best_j_x = jnp.where(better, xj, best_j_x)

    # ---- emission: threshold on pct of the max attainable score ----
    smax = jnp.minimum(rlen[:, None], window_len) * match
    thr = (smax.astype(jnp.float32) * (threshold_pct / 100.0)
           ).astype(jnp.int32)
    emit = valid & (max_score >= thr)

    # window start: centre the anchor pair (hit_list_batch's goff rule,
    # single-contig shard form)
    x_len = (x - best_j_x) + ln
    goff = jnp.where((window_len - x_len) // 2 < best_j_x,
                     best_j_x - (window_len - x_len) // 2, 0)
    goff = jnp.minimum(goff, max(genome_len - window_len, 0))

    score_masked = jnp.where(emit, max_score, -1)
    top_score, top_idx = jax.lax.top_k(score_masked, n_out)
    top_goff = jnp.take_along_axis(goff, top_idx, axis=1)
    top_matches = jnp.take_along_axis(n_matches, top_idx, axis=1)
    ok = top_score >= 0
    return {
        "g_off": jnp.where(ok, top_goff, -1).astype(jnp.int32),
        "score": top_score.astype(jnp.int32),
        "matches": jnp.where(ok, top_matches, 0).astype(jnp.int32),
        "n": jnp.sum(ok, axis=1).astype(jnp.int32),
        "dropped": dropped,
    }


def gather_windows_device(genome: jax.Array, g_off: jax.Array,
                          window_len: int, pad_code: int = -1) -> jax.Array:
    """Gather candidate windows from the device-resident genome plane.

    g_off int32 [B, N] (-1 invalid) -> int8 [B, N, window_len]."""
    G = genome.shape[0]
    j = jnp.arange(window_len)
    src = jnp.clip(g_off[:, :, None] + j[None, None, :], 0, G - 1)
    out = genome[src]
    return jnp.where(g_off[:, :, None] >= 0, out, jnp.int8(pad_code))

"""The end-to-end unpaired mapping funnel (L4) — handle_read, batched.

Replicates `gmapper/mapping.c:handle_read` (:1791-1868) and its stages for a
whole batch of reads at once:

  candidates (vectorized host)  →  pass1 vector-SW filter (device, batched)
                                →  window-overlap suppression + top-k
                                →  pass2 full-SW (device DP, vectorized
                                   traceback)
                                →  posterior/threshold/dedup/top-k → MQV → SAM

Known equivalences vs the reference (verified by golden byte-parity tests):
  * pass1 computes scores for windows the reference's overlap suppression
    would skip, then applies the identical suppression scan on the scores —
    same survivors, batched compute (mapping.c:1303-1311).
  * pass2 skips the redundant letter-space vector re-score: the 3-state full
    SW score is never above the vector score, so threshold filtering on the
    full score alone selects the same set (hit_run_full_sw, mapping.c:400-415).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

import numpy as np

from shrimp_tpu import dna, mapq
from shrimp_tpu.index import GenomeIndex
from shrimp_tpu.io import sam
from shrimp_tpu.ops import sw_full, sw_vector
from shrimp_tpu.ops.params import ScoreProbs
from shrimp_tpu.pipeline import candidates as cand
from shrimp_tpu.pipeline import candidates_batch as cb
from shrimp_tpu.pipeline.options import (MapperConfig, ReadMappingOptions,
                                         abs_or_pct, is_absolute)
from shrimp_tpu.utils import telemetry


import functools as _functools


@_functools.partial(__import__("jax").jit,
                    static_argnames=("G", "params", "engine"))
def _p1_gather_score_ls(plane_pad, lo, wlen, rid, st, reads2, G, params,
                        engine="scan"):
    """Fused on-device window gather + pass-1 vector SW (LS).

    plane_pad int8 [L + PASS1_PLANE_PAD] resident genome plane padded
    with GENOME_PAD; lo int32 [C] absolute window starts; rid/st int32
    [C] select each window's read row from reads2 int8 [B, 2, R].
    Windows never overhang their contig (hit_list clamps
    g_off + w_len <= clen), so bytes at cols < wlen equal the
    host-gathered bytes and cols >= wlen are masked — bit-identical to
    the pre-gathered path.  A vmapped dynamic_slice lowers to per-row
    HBM DMA, ~50x faster than a [C, G] jnp.take gather on TPU."""
    import jax
    import jax.numpy as jnp
    win = jax.vmap(
        lambda l: jax.lax.dynamic_slice_in_dim(plane_pad, l, G))(lo)
    cols = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    win = jnp.where(cols < wlen[:, None], win,
                    jnp.int8(sw_vector.GENOME_PAD))
    rb = reads2[rid, st]
    return sw_vector.sw_score_engine(win, rb, params, engine=engine)


# measured host->HBM probe bandwidth (bytes/s), shared per process
_SHIP_BW: float | None = None

@_functools.partial(__import__("jax").jit,
                    static_argnames=("G", "params", "engine"))
def _p1_gather_score_cs(cs_cat, ls_cat, lo, wlen, rid, ist, initbp,
                        reads2, G, params, engine="scan"):
    """Fused on-device window gather + pass-1 vector SW (colour space).

    cs_cat / ls_cat are the forward||reverse-complement concatenations
    of the CS and LS genome planes (+GENOME_PAD tail), so a reverse hit
    is just an offset-by-L start — one dynamic-slice per plane per row.
    The LS slice feeds the row-0 plane (lstocs against the read's
    initbp, sw-vector.c:111-147), computed on device; bit-identical to
    the host-gathered path."""
    import jax
    import jax.numpy as jnp
    win_cs = jax.vmap(
        lambda l: jax.lax.dynamic_slice_in_dim(cs_cat, l, G))(lo)
    win_ls = jax.vmap(
        lambda l: jax.lax.dynamic_slice_in_dim(ls_cat, l, G))(lo)
    cols = jax.lax.broadcasted_iota(jnp.int32, win_cs.shape, 1)
    live = cols < wlen[:, None]
    win_cs = jnp.where(live, win_cs, jnp.int8(sw_vector.GENOME_PAD))
    win_ls = jnp.where(live, win_ls, jnp.int8(sw_vector.GENOME_PAD))
    row0 = jnp.where(
        (win_ls >= 0) & (win_ls <= 3), win_ls ^ initbp[:, None],
        jnp.where(win_ls == jnp.int8(sw_vector.GENOME_PAD),
                  jnp.int8(sw_vector.GENOME_PAD),
                  jnp.int8(dna.BASE_N))).astype(jnp.int8)
    rb = reads2[rid, ist]
    return sw_vector.sw_score_engine(win_cs, rb, params,
                                     genome_row0=row0, engine=engine)


# genomes past the TPU's int32 dynamic-slice offset ceiling split the
# resident plane here; each window slices both halves and keeps the
# in-range one (_p1_gather_score_ls_2pl)
PASS1_PLANE_SPLIT = (1 << 31) - (1 << 13)
# largest genome the single int32-indexed plane covers (tests shrink
# these constants to exercise the split path on toy genomes)
PASS1_PLANE_SINGLE_MAX = (1 << 31) - (1 << 12)


@_functools.partial(__import__("jax").jit,
                    static_argnames=("G", "params", "engine"))
def _p1_gather_score_ls_2pl(plane_a, plane_b, in_a, lo_a, lo_b, wlen,
                            rid, st, reads2, G, params, engine="scan"):
    """Two-plane variant of `_p1_gather_score_ls` for genomes >= 2^31
    bases.  Absolute int64 starts cannot cross the wire (JAX downcasts
    to int32 without x64 mode, and TPU dynamic-slice offsets are int32
    anyway — both silently wrap past 2^31), so the host pre-splits each
    start into (in_a, lo_a, lo_b) int32 coordinates: plane A covers
    [0, PASS1_PLANE_SPLIT + PASS1_PLANE_PAD), plane B covers
    [PASS1_PLANE_SPLIT, end] + pad.  Both slices run (per-row DMA); the
    in-range one is kept — bit-identical to the host gather."""
    import jax
    import jax.numpy as jnp
    win_a = jax.vmap(
        lambda l: jax.lax.dynamic_slice_in_dim(plane_a, l, G))(lo_a)
    win_b = jax.vmap(
        lambda l: jax.lax.dynamic_slice_in_dim(plane_b, l, G))(lo_b)
    win = jnp.where(in_a[:, None], win_a, win_b)
    cols = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
    win = jnp.where(cols < wlen[:, None], win,
                    jnp.int8(sw_vector.GENOME_PAD))
    rb = reads2[rid, st]
    return sw_vector.sw_score_engine(win, rb, params, engine=engine)


# pass-1 work is cut into fixed-size chunks: stable compile shapes, no
# power-of-two padding blow-up on million-window batches, and the host
# gather of chunk k+1 overlaps the (async-dispatched) device DP of chunk k
PASS1_CHUNK = 1 << 18
# bytes of GENOME_PAD appended to the resident device plane so the
# dynamic_slice window gather stays in bounds at any start < L
PASS1_PLANE_PAD = 1 << 12


def _chunk_sizes(n: int, chunk: int = PASS1_CHUNK) -> list[int]:
    """Split n rows into kernel invocations: full fixed-size chunks plus
    one tail bucket.  Multi-chunk batches restrict the tail to
    {chunk/2, chunk} so a whole run exercises exactly two compile shapes
    — every distinct shape is a fresh XLA compile (~25 s through the
    remote-compile tunnel) that would otherwise land mid-run whenever a
    batch's window count crossed a new power of two.  Single-chunk
    batches (small CLI runs) keep fine-grained buckets: they compile
    once regardless."""
    if n == 0:
        return []
    if n < chunk:
        return [_bucket_rows(n)]
    sizes = []
    while n >= chunk:
        sizes.append(chunk)
        n -= chunk
    if n:
        sizes.append(chunk // 2 if n <= chunk // 2 else chunk)
    return sizes


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_rows(n: int, lo: int = 128) -> int:
    """Round a batch row count up to a power of two (>= lo) so kernel shapes
    stay stable across batches and XLA compiles once."""
    b = lo
    while b < n:
        b <<= 1
    return b


def _pad_rows(arr: np.ndarray, rows: int, fill) -> np.ndarray:
    if arr.shape[0] == rows:
        return arr
    pad_shape = (rows - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])


def _concat_aranges(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... as one flat int64 array."""
    total = int(lengths.sum())
    starts = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=starts[1:])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(starts[:-1], lengths))


@dataclass
class FinalHit:
    """One reported alignment (read_hit + sw_full_results subset)."""

    cn: int
    gen_st: int                 # 0 = forward genome strand, 1 = reverse
    g_off: int                  # window start, frame per gen_st
    w_len: int
    score_full: int             # posterior score (== SW score in LS)
    sw_score: int
    pass2_key: int
    posterior: float
    read_start: int
    genome_start: int           # window-relative
    rmapped: int
    gmapped: int
    matches: int
    mismatches: int
    insertions: int
    deletions: int
    ops: np.ndarray
    mqv: int = 255
    z0: float = 0.0
    z1: float = 0.0
    # --extra-sam-fields side data (output.c:739-756)
    kmer_matches: int = 0             # read_hit.matches (kmer count)
    score_window_gen: int = 0
    score_vector: int = 0
    # paired-mode extras (compute_paired_mqv, output.c:812-942)
    score_max: int = 0
    z2: float = 0.0
    z3: float = 0.0
    pr_top_random: float = 1.0
    insert_size_denom: float = 0.0
    pr_missed_mp: float = 0.0
    # colour-space extras (sw_full_results CS fields + post_sw output)
    crossovers: int = 0
    dbalign: str = ""
    qralign: str = ""
    qual33: str | None = None


class Mapper:
    """Maps batches of reads against a GenomeIndex."""

    def __init__(self, index: GenomeIndex, cfg: MapperConfig | None = None):
        self.index = index
        self.cfg = cfg or MapperConfig()
        self.probs = ScoreProbs.from_scores(self.cfg.params,
                                            self.cfg.colour_space)
        # reverse-complement genome plane, same contig offsets
        # (genome_contigs_rc, genome.c:1107)
        parts = []
        for c in range(index.num_contigs):
            lo = int(index.contig_offsets[c])
            hi = lo + int(index.contig_len[c])
            parts.append(dna.reverse_complement(index.genome[lo:hi]))
        self.genome_rc = (np.concatenate(parts).astype(np.int8)
                          if parts else np.zeros(0, np.int8))
        # CS planes: colour translations of both letter strands
        # (genome_cs_contigs / genome_cs_contigs_rc, genome.c:1098-1119)
        self.genome_cs = index.genome_cs
        self.genome_cs_rc = None
        if self.cfg.colour_space:
            assert index.genome_cs is not None, \
                "colour-space mapping needs an index built with colour_space"
            rc_parts = []
            for c in range(index.num_contigs):
                lo = int(index.contig_offsets[c])
                hi = lo + int(index.contig_len[c])
                rc_parts.append(dna.letters_to_colours(self.genome_rc[lo:hi],
                                                       dna.BASE_T))
            self.genome_cs_rc = (np.concatenate(rc_parts).astype(np.int8)
                                 if rc_parts else np.zeros(0, np.int8))
        # the CS vector filter scores colour mismatches as one crossover
        # (f1_setup arg: match + crossover, gmapper.c:2932-2934)
        self.vect_params = (self.cfg.params if not self.cfg.colour_space
                            else self.cfg.params.with_(
                                mismatch=self.cfg.params.match
                                + self.cfg.params.crossover))
        self.min_seed_span = index.seed_set.min_span
        self.stats = {"reads": 0, "reads_matched": 0, "reads_dropped": 0,
                      "total_matches": 0, "pass1_windows": 0,
                      "pass2_windows": 0, "dup_matches_pruned": 0,
                      "reads_dropped_max_aln": 0, "reads_matched_conf": 0,
                      "device_l3_fallbacks": 0}
        self.tel = telemetry.Telemetry()
        self._dev_l3 = None
        self._genome_dev = None
        self._dev_l3_a_cap = self.DEVICE_L3_A_CAP
        self._dev_l3_a2_cap = self.DEVICE_L3_A2_CAP
        self._l3_choice = None          # auto-tune result ("device"/"host")
        self._l3_reason = None          # why, when decided without timing
        self._l3_model = None           # amortization-model inputs (JSON)
        self._pass1_engine = None       # auto-tune result (PASS1_ENGINES)
        self._pass1_path = None         # auto-tune result ("device"/"host")
        # the pipelined streams run two batches on worker threads; counter
        # read-modify-writes must not interleave (#pragma omp atomic
        # analogue, mapping.c:1732-1750)
        self._stats_lock = threading.Lock()

    def _bump(self, **deltas) -> None:
        with self._stats_lock:
            for k, v in deltas.items():
                self.stats[k] += v

    def _pass1_engine_choice(self, NB: int, G: int, R: int) -> str:
        """Resolve the pass-1 vector-SW engine once per run.

        Explicit choice comes from $SHRIMP_TPU_PASS1 or
        cfg.pass1_engine; "auto" times the three bit-identical
        formulations (scan wavefront / row-scan / Pallas VMEM) at the
        production bucket shape on the first batch and keeps the fastest
        — the TPU analogue of sw_vector_setup picking the SSE2 path once
        (sw-vector.c:389).  Off-TPU auto always picks "scan" (the Pallas
        kernel would run interpreted)."""
        if self._pass1_engine is not None:
            return self._pass1_engine
        # the pipelined streams call this from two worker threads; only
        # one may run the 3-engine timing benchmark (check-then-act under
        # the same lock discipline as the stats counters)
        with self._stats_lock:
            if self._pass1_engine is not None:
                return self._pass1_engine
            import os as _os

            import jax
            choice = (_os.environ.get("SHRIMP_TPU_PASS1")
                      or self.cfg.pass1_engine or "auto")
            if choice != "auto":
                if choice not in sw_vector.PASS1_ENGINES:
                    raise ValueError(
                        f"unknown pass-1 engine {choice!r}; expected one "
                        f"of {sw_vector.PASS1_ENGINES} or 'auto'")
                self._pass1_engine = choice
                return choice
            if jax.default_backend() != "tpu":
                self._pass1_engine = "scan"
                return "scan"
            rng = np.random.default_rng(0)
            gb = rng.integers(0, 4, (NB, G)).astype(np.int8)
            rb = rng.integers(0, 4, (NB, R)).astype(np.int8)
            row0 = gb if self.cfg.colour_space else None
            params = self.vect_params
            best, best_t = "scan", float("inf")
            for eng in sw_vector.PASS1_ENGINES:
                try:
                    out = sw_vector.sw_score_engine(gb, rb, params,
                                                    genome_row0=row0,
                                                    engine=eng)
                    np.asarray(out)                  # compile + warm
                    t = float("inf")
                    for _ in range(3):               # tunnel noise: best-of-3
                        t0 = time.time()
                        np.asarray(sw_vector.sw_score_engine(
                            gb, rb, params, genome_row0=row0, engine=eng))
                        t = min(t, time.time() - t0)
                except Exception:
                    continue
                if t < best_t:
                    best, best_t = eng, t
            self._pass1_engine = best
            return best

    def _pass1_dev_ok(self, G: int) -> bool:
        """Device-side pass-1 window-gather eligibility (LS, genome plane
        resident in HBM).  cfg.device_pass1_gather: True / False force
        the path; "auto" resolves by timing both on the first
        production-shape chunk (TPU only — see _vector_scores)."""
        if self.cfg.colour_space or self.cfg.device_pass1_gather is False:
            return False
        if self._pass1_path == "host":
            return False
        # hg18-class (> 2^31) genomes ride a two-plane select: TPU
        # dynamic_slice offsets are int32 internally (int64 starts
        # beyond 2^31 silently truncate — measured as matched_frac 0 at
        # 3.1 Gbp), so the plane is split at PASS1_PLANE_SPLIT and each
        # window slices both halves, keeping the in-range one
        if self.index.total_len >= PASS1_PLANE_SPLIT \
                + PASS1_PLANE_SINGLE_MAX - PASS1_PLANE_PAD \
                or self.index.total_len == 0 or G > PASS1_PLANE_PAD:
            return False
        if self.cfg.device_pass1_gather == "auto":
            import jax
            if jax.default_backend() != "tpu" and self._pass1_path is None:
                self._pass1_path = "host"
                return False
        return True

    def _genome_dev_plane(self):
        """The resident padded device plane(s) (shipped once per run).

        Returns one array for genomes under 2^31 bases, else an
        (A, B) pair split at PASS1_PLANE_SPLIT: A carries
        [0, SPLIT + PASS1_PLANE_PAD) so windows starting just before the
        split read their real continuation, B carries [SPLIT, end] plus
        pad — both under the TPU's int32 dynamic-slice offset ceiling."""
        if self._genome_dev is None:
            import jax.numpy as jnp
            g = np.asarray(self.index.genome)
            if self.index.total_len < PASS1_PLANE_SINGLE_MAX:
                self._genome_dev = jnp.pad(
                    jnp.asarray(g), (0, PASS1_PLANE_PAD),
                    constant_values=sw_vector.GENOME_PAD)
                self._genome_dev.block_until_ready()
            else:
                a = jnp.asarray(g[:PASS1_PLANE_SPLIT + PASS1_PLANE_PAD])
                b = jnp.pad(jnp.asarray(g[PASS1_PLANE_SPLIT:]),
                            (0, PASS1_PLANE_PAD),
                            constant_values=sw_vector.GENOME_PAD)
                a.block_until_ready()
                b.block_until_ready()
                self._genome_dev = (a, b)
        return self._genome_dev

    def _genome_dev_planes_cs(self):
        """Resident CS device planes: (cs_fw||cs_rc, ls_fw||ls_rc), each
        GENOME_PAD-tailed (shipped once per run)."""
        if self._genome_dev is None:
            import jax.numpy as jnp
            pad = np.full(PASS1_PLANE_PAD, sw_vector.GENOME_PAD, np.int8)
            cs_cat = jnp.asarray(np.concatenate(
                [np.asarray(self.genome_cs), np.asarray(self.genome_cs_rc),
                 pad]))
            ls_cat = jnp.asarray(np.concatenate(
                [np.asarray(self.index.genome), self.genome_rc, pad]))
            cs_cat.block_until_ready()
            ls_cat.block_until_ready()
            self._genome_dev = (cs_cat, ls_cat)
        return self._genome_dev

    def _pass1_dev_ok_cs(self, G: int) -> bool:
        """Device-side pass-1 gather eligibility, colour space: both
        fw||rc concatenations must sit under the int32 slice ceiling."""
        if self.cfg.device_pass1_gather is False:
            return False
        if self._pass1_path == "host":
            return False
        L = self.index.total_len
        if 2 * L + PASS1_PLANE_PAD >= (1 << 31) or L == 0 \
                or G > PASS1_PLANE_PAD:
            return False
        if self.cfg.device_pass1_gather == "auto":
            import jax
            if jax.default_backend() != "tpu" and self._pass1_path is None:
                self._pass1_path = "host"
                return False
        return True

    # ------------------------------------------------------------------
    def _gather_windows(self, plane: np.ndarray, cn: np.ndarray,
                        g_off: np.ndarray, w_len: np.ndarray,
                        G: int) -> np.ndarray:
        """Vectorized window extraction → int8 [N, G] padded with GENOME_PAD.

        Bulk rows go through a strided sliding-window view indexed by the
        row's start (one [N] gather — ~4.4x faster than an [N, G] fancy
        index); the rare rows whose start lies within G of the plane end
        (where the view's start clamp would shift the contents) take the
        exact per-element clamp path.  Bit-identical to the element-wise
        min(lo+col, L-1) gather because windows never overhang their
        contig (g_off + w_len <= clen)."""
        L = len(plane)
        lo = self.index.contig_offsets[cn] + g_off
        cols = np.arange(G, dtype=np.int64)[None, :]
        if G > L:
            idxm = np.minimum(lo[:, None] + cols, L - 1)
            out = plane[idxm]
        else:
            swv = np.lib.stride_tricks.sliding_window_view(plane, G)
            out = swv[np.minimum(lo, L - G)]
            tail = np.flatnonzero(lo > L - G)
            if len(tail):
                idxm = np.minimum(lo[tail][:, None] + cols, L - 1)
                out[tail] = plane[idxm]
        return np.where(cols >= w_len[:, None],
                        np.int8(sw_vector.GENOME_PAD),
                        out).astype(np.int8)

    def _tune_pass1_path(self, plane_pad, lo, wl, ridp, stp, rb2, cn,
                         g_off_pos, w_len, rid, st, C, G, R, engine):
        """Resolve host-gather vs device-gather pass-1 once per run by
        timing both on the first production-shape chunk (real inputs,
        compile excluded) — the honest re-tune of the round-2
        device_pass1_gather measurement."""
        with self._stats_lock:
            if self._pass1_path is not None:
                return self._pass1_path == "device"
            import jax.numpy as jnp
            p = self.cfg.params
            rb2_d = jnp.asarray(rb2)

            def run_dev():
                if isinstance(plane_pad, tuple):
                    return np.asarray(_p1_gather_score_ls_2pl(
                        plane_pad[0], plane_pad[1], lo[0], lo[1], lo[2],
                        wl, ridp, stp, rb2_d, G, p, engine=engine))
                return np.asarray(_p1_gather_score_ls(
                    plane_pad, lo, wl, ridp, stp, rb2_d, G, p,
                    engine=engine))

            rows = len(lo[1]) if isinstance(lo, tuple) else len(lo)

            def run_host():
                gb = self._gather_windows(self.index.genome, cn[:C],
                                          g_off_pos[:C], w_len[:C], G)
                rb = rb2[rid[:C], st[:C]]
                gb = _pad_rows(gb, rows, sw_vector.GENOME_PAD)
                rb = _pad_rows(rb, rows, sw_vector.READ_PAD)
                return np.asarray(sw_vector.sw_score_engine(
                    gb, rb, p, engine=engine))

            run_dev()                        # compile
            t0 = time.time()
            run_dev()
            t_dev = time.time() - t0
            run_host()                       # compile
            t0 = time.time()
            run_host()
            t_host = time.time() - t0
            self._pass1_path = "device" if t_dev <= t_host else "host"
            return self._pass1_path == "device"

    def _tune_path_cs(self, dev_chunk, sl, C, n, rev_all, goff_f_all, cn,
                      w_len, rid, istrand, initbp_all, rb2, G, engine):
        """Resolve host-gather vs device-gather CS pass-1 once per run
        by timing both on the first production chunk (compile excluded)
        — the CS counterpart of `_tune_pass1_path`.  Returns the timed
        device result (scores for rows sl) when the device path wins so
        the caller reuses it instead of recomputing the chunk."""
        with self._stats_lock:
            if self._pass1_path is not None:
                return None

            def run_dev():
                return np.asarray(dev_chunk(sl, C))

            def run_host():
                rev = rev_all[sl]
                goff_f = goff_f_all[sl]
                g_cs = np.where(
                    rev[:, None],
                    self._gather_windows(self.genome_cs_rc, cn[sl],
                                         goff_f, w_len[sl], G),
                    self._gather_windows(self.genome_cs, cn[sl],
                                         goff_f, w_len[sl], G))
                g_ls = np.where(
                    rev[:, None],
                    self._gather_windows(self.genome_rc, cn[sl],
                                         goff_f, w_len[sl], G),
                    self._gather_windows(self.index.genome, cn[sl],
                                         goff_f, w_len[sl], G))
                initbp = initbp_all[sl][:, None]
                row0 = np.where(
                    (g_ls >= 0) & (g_ls <= 3), g_ls ^ initbp,
                    np.where(g_ls == sw_vector.GENOME_PAD,
                             np.int8(sw_vector.GENOME_PAD),
                             np.int8(dna.BASE_N))).astype(np.int8)
                rb = rb2[rid[sl], istrand[sl]]
                gb = _pad_rows(g_cs.astype(np.int8), C,
                               sw_vector.GENOME_PAD)
                rb = _pad_rows(rb, C, sw_vector.READ_PAD)
                row0 = _pad_rows(row0, C, sw_vector.GENOME_PAD)
                np.asarray(sw_vector.sw_score_engine(
                    gb, rb, self.vect_params, genome_row0=row0,
                    engine=engine))

            run_dev()                        # compile
            t0 = time.time()
            dev_res = run_dev()
            t_dev = time.time() - t0
            run_host()                       # compile
            t0 = time.time()
            run_host()
            t_host = time.time() - t0
            self._pass1_path = "device" if t_dev <= t_host else "host"
            return dev_res if self._pass1_path == "device" else None

    def _vector_scores(self, entries, rid, st, cn, g_off_pos, w_len,
                       istrand, G: int, R: int, NB: int,
                       sync: bool = True):
        """Pass-1 vector-SW scores for hit rows (g_off in pos-strand frame).

        LS scores read[st] against the forward genome; CS first applies the
        reverse_hit framing (read_pass1_per_strand, mapping.c:1317-1341):
        the input-strand colour read against the CS plane of the hit's
        genome strand, colour 0 against lstocs(letter plane, initbp).

        Work is dispatched in PASS1_CHUNK-row chunks (async); with
        sync=False the return value is a list of (device_handle, n_valid)
        pairs that _pass1_finish concatenates.  LS windows are gathered
        ON DEVICE from the resident padded genome plane when that wins
        the per-run path tuning: per-chunk transfer drops from
        O(windows * G) window bytes to O(windows) int32 starts + one
        [B, 2, R] read matrix per batch."""
        cfg = self.cfg
        N = len(rid)
        engine = self._pass1_engine_choice(
            min(PASS1_CHUNK, _bucket_rows(N)), G, R)
        out = []
        if not cfg.colour_space:
            rb2 = self._reads2_matrix(entries, R)
            use_dev = self._pass1_dev_ok(G)
            if use_dev:
                plane_pad = self._genome_dev_plane()
                lo64 = (self.index.contig_offsets[cn]
                        + g_off_pos).astype(np.int64)
                if self.index.total_len < PASS1_PLANE_SINGLE_MAX:
                    lo_all = lo64.astype(np.int32)
                else:
                    # host-side split coordinates (see
                    # _p1_gather_score_ls_2pl on why int64 can't ship)
                    lo_all = (
                        (lo64 < PASS1_PLANE_SPLIT),
                        np.clip(lo64, 0,
                                PASS1_PLANE_SPLIT - 1).astype(np.int32),
                        np.maximum(lo64 - PASS1_PLANE_SPLIT,
                                   0).astype(np.int32))
                if self.cfg.device_pass1_gather == "auto" \
                        and self._pass1_path is None:
                    C = min(PASS1_CHUNK, _bucket_rows(N))
                    lo_h = (tuple(_pad_rows(a[:C], C, 0) for a in lo_all)
                            if isinstance(lo_all, tuple)
                            else _pad_rows(lo_all[:C], C, 0))
                    use_dev = self._tune_pass1_path(
                        plane_pad, lo_h,
                        _pad_rows(w_len[:C].astype(np.int32), C, 0),
                        _pad_rows(rid[:C].astype(np.int32), C, 0),
                        _pad_rows(st[:C].astype(np.int32), C, 0),
                        rb2, cn, g_off_pos, w_len, rid, st,
                        min(C, N), G, R, engine)
            if use_dev:
                import jax.numpy as jnp
                rb2_d = jnp.asarray(rb2)
                pos = 0
                for C in _chunk_sizes(N):
                    n = min(C, N - pos)
                    sl = slice(pos, pos + n)
                    rest = (_pad_rows(w_len[sl].astype(np.int32), C, 0),
                            _pad_rows(rid[sl].astype(np.int32), C, 0),
                            _pad_rows(st[sl].astype(np.int32), C, 0),
                            rb2_d, G, cfg.params)
                    if isinstance(plane_pad, tuple):
                        dev = _p1_gather_score_ls_2pl(
                            plane_pad[0], plane_pad[1],
                            _pad_rows(lo_all[0][sl], C, False),
                            _pad_rows(lo_all[1][sl], C, 0),
                            _pad_rows(lo_all[2][sl], C, 0),
                            *rest, engine=engine)
                    else:
                        dev = _p1_gather_score_ls(
                            plane_pad, _pad_rows(lo_all[sl], C, 0),
                            *rest, engine=engine)
                    out.append((dev, n))
                    pos += n
            else:
                pos = 0
                for C in _chunk_sizes(N):
                    n = min(C, N - pos)
                    sl = slice(pos, pos + n)
                    gb = self._gather_windows(self.index.genome, cn[sl],
                                              g_off_pos[sl], w_len[sl], G)
                    rb = rb2[rid[sl], st[sl]]
                    gb = _pad_rows(gb, C, sw_vector.GENOME_PAD)
                    rb = _pad_rows(rb, C, sw_vector.READ_PAD)
                    dev = sw_vector.sw_score_engine(gb, rb, cfg.params,
                                                    engine=engine)
                    out.append((dev, n))
                    pos += n
            if not sync:
                return out
            return np.concatenate(
                [np.asarray(d)[:n] for d, n in out]).astype(np.int64)

        clen = self.index.contig_len[cn]
        wl_all = w_len.astype(np.int64)
        rev_all = st != istrand
        goff_f_all = np.where(rev_all, clen - g_off_pos - wl_all, g_off_pos)
        initbp_all = np.array([entries[r].initbp for r in rid], np.int8)
        rb2 = self._reads2_matrix(entries, R)
        use_dev = self._pass1_dev_ok_cs(G)
        if use_dev:
            import jax.numpy as jnp
            cs_cat, ls_cat = self._genome_dev_planes_cs()
            # reverse hits address the rc half of the concatenations
            lo_abs_all = (self.index.contig_offsets[cn] + goff_f_all
                          + np.where(rev_all, self.index.total_len, 0)
                          ).astype(np.int32)
            rb2_d = jnp.asarray(rb2)

            def _dev_chunk(sl, C):
                return _p1_gather_score_cs(
                    cs_cat, ls_cat, _pad_rows(lo_abs_all[sl], C, 0),
                    _pad_rows(w_len[sl].astype(np.int32), C, 0),
                    _pad_rows(rid[sl].astype(np.int32), C, 0),
                    _pad_rows(istrand[sl].astype(np.int32), C, 0),
                    _pad_rows(initbp_all[sl], C, 0),
                    rb2_d, G, self.vect_params, engine=engine)
        pos = 0
        for C in _chunk_sizes(N):
            n = min(C, N - pos)
            sl = slice(pos, pos + n)
            if use_dev:
                tuned = None
                if self.cfg.device_pass1_gather == "auto" \
                        and self._pass1_path is None:
                    tuned = self._tune_path_cs(
                        _dev_chunk, sl, C, n, rev_all, goff_f_all, cn,
                        w_len, rid, istrand, initbp_all, rb2, G, engine)
                    if self._pass1_path == "host":
                        use_dev = False
                if use_dev:
                    out.append((tuned if tuned is not None
                                else _dev_chunk(sl, C), n))
                    pos += n
                    continue
            rev = rev_all[sl]
            goff_f = goff_f_all[sl]
            g_cs = np.where(
                rev[:, None],
                self._gather_windows(self.genome_cs_rc, cn[sl], goff_f,
                                     w_len[sl], G),
                self._gather_windows(self.genome_cs, cn[sl], goff_f,
                                     w_len[sl], G))
            g_ls = np.where(
                rev[:, None],
                self._gather_windows(self.genome_rc, cn[sl], goff_f,
                                     w_len[sl], G),
                self._gather_windows(self.index.genome, cn[sl], goff_f,
                                     w_len[sl], G))
            initbp = initbp_all[sl][:, None]
            row0 = np.where(
                (g_ls >= 0) & (g_ls <= 3), g_ls ^ initbp,
                np.where(g_ls == sw_vector.GENOME_PAD,
                         np.int8(sw_vector.GENOME_PAD),
                         np.int8(dna.BASE_N))).astype(np.int8)
            rb = rb2[rid[sl], istrand[sl]]
            gb = _pad_rows(g_cs.astype(np.int8), C, sw_vector.GENOME_PAD)
            rb = _pad_rows(rb, C, sw_vector.READ_PAD)
            row0 = _pad_rows(row0, C, sw_vector.GENOME_PAD)
            dev = sw_vector.sw_score_engine(
                gb, rb, self.vect_params, genome_row0=row0,
                engine=engine)
            out.append((dev, n))
            pos += n
        if not sync:
            return out
        return np.concatenate(
            [np.asarray(d)[:n] for d, n in out]).astype(np.int64)

    def map_batch(self, reads: list[tuple[str, str, str | None]],
                  options: list[ReadMappingOptions] | None = None
                  ) -> list[tuple[cand.ReadEntry, list[FinalHit]]]:
        """Map a batch of (name, seq, qual) reads; returns final hits per
        read in input order."""
        cfg = self.cfg
        option_sets = options or cfg.unpaired_options()

        with self.tel.stage("readparse"):
            entries = cand.prepare_reads(reads, cfg, self.min_seed_span)
            if cfg.seed_qual_filter:
                # Qflag && SQFflag gate (mapping.c:78): FASTA reads carry
                # no quals, so the filter is inert for them
                cand.apply_seed_qual_filter(entries, self.index.seed_set,
                                            cfg.qual_delta)
        ok = np.array([e.read_len <= cfg.longest_read_len
                       and e.max_n_kmers > 0 for e in entries])
        self._bump(reads=len(entries), reads_dropped=int((~ok).sum()))

        live_entries = [e for e, o in zip(entries, ok) if o]
        live_map = np.flatnonzero(ok)
        results: list[list[FinalHit]] = [[] for _ in entries]

        # multi-round option-set fall-through (handle_read loop,
        # mapping.c:1807-1858): a read advances to the next option set while
        # its pass2 round reports not-done (stop_count/stop_threshold)
        pending = list(range(len(live_entries)))
        for opts in option_sets:
            if not pending:
                break
            sub = [live_entries[i] for i in pending]
            per_read: dict[int, list[FinalHit]] = {}
            hb = self._candidates(sub, opts)
            if hb.n:
                self._bump(pass1_windows=hb.n)
                with self.tel.stage("pass1"):
                    sel = self._pass1(sub, hb, opts)
                if sel is not None:
                    self._bump(pass2_windows=len(sel["rid"]))
                    with self.tel.stage("pass2"):
                        per_read = self._pass2(sub, sel, opts)
            nxt = []
            for k, li in enumerate(pending):
                hits = per_read.get(k, [])
                if hits:
                    results[live_map[li]].extend(hits)
                if opts.pass2.stop_count > 0:
                    cnt = sum(
                        1 for h in hits
                        if h.score_full >= int(abs_or_pct(
                            opts.pass2.stop_threshold, h.score_max)))
                    if cnt < opts.pass2.stop_count:
                        nxt.append(li)
            pending = nxt

        n_m = sum(1 for hits in results if hits)
        n_t = sum(len(hits) for hits in results)
        self._bump(reads_matched=n_m, total_matches=n_t)
        return list(zip(entries, results))

    # ------------------------------------------------------------------
    def map_stream(self, reads_iter, batch_size: int = 8192,
                   options: list[ReadMappingOptions] | None = None,
                   n_workers: int = 1):
        """Pipelined mapping over a read stream.

        Yields (ReadEntry, hits) in input order.  Host work (read prep,
        candidate generation, selection) for one batch overlaps the
        asynchronous device DP of its neighbours — the reference's
        OpenMP-overlap analogue with the chip as the second 'thread'.

        n_workers > 1 (-N) runs whole batches on a worker pool instead:
        up to n_workers batches in flight, numpy/C stages release the GIL
        so host multicore machines get real concurrency (output order and
        bytes identical — stats are lock-guarded)."""
        cfg = self.cfg
        opts = (options or cfg.unpaired_options())[0]

        if n_workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=n_workers)

            def run_batch(reads):
                return self.map_batch(reads, options=options)

            try:
                futs = []
                batch: list = []
                for rec in reads_iter:
                    batch.append(rec)
                    if len(batch) >= batch_size:
                        futs.append(ex.submit(run_batch, batch))
                        batch = []
                        while len(futs) > n_workers:
                            yield from futs.pop(0).result()
                if batch:
                    futs.append(ex.submit(run_batch, batch))
                for f in futs:
                    yield from f.result()
            finally:
                ex.shutdown(wait=True)
            return

        def stage0(reads):
            with self.tel.stage("readparse"):
                entries = cand.prepare_reads(reads, cfg, self.min_seed_span)
                if cfg.seed_qual_filter:
                    cand.apply_seed_qual_filter(
                        entries, self.index.seed_set, cfg.qual_delta)
            ok = np.array([e.read_len <= cfg.longest_read_len
                           and e.max_n_kmers > 0 for e in entries])
            self._bump(reads=len(entries), reads_dropped=int((~ok).sum()))
            live = [e for e, o in zip(entries, ok) if o]
            live_map = np.flatnonzero(ok)
            hb = self._candidates(live, opts) if live else None
            with self.tel.stage("pass1"):
                p1 = (self._pass1_dispatch(live, hb, opts)
                      if hb is not None and hb.n else None)
            if hb is not None and hb.n:
                self._bump(pass1_windows=hb.n)
            return {"entries": entries, "live": live, "live_map": live_map,
                    "hb": hb, "p1": p1}

        def stage1(st0):
            if st0["p1"] is None:
                st0["sel"] = None
                st0["p2"] = None
                return st0
            with self.tel.stage("pass1"):
                sel = self._pass1_finish(st0["live"], st0["hb"], opts,
                                         st0["p1"])
            st0["sel"] = sel
            with self.tel.stage("pass2"):
                st0["p2"] = (self._pass2_dispatch(st0["live"], sel)
                             if sel is not None else None)
            if sel is not None:
                self._bump(pass2_windows=len(sel["rid"]))
            return st0

        def stage2(st0):
            entries = st0["entries"]
            results = [[] for _ in entries]
            if st0["p2"] is not None:
                with self.tel.stage("pass2"):
                    per_read = self._pass2_finish(st0["live"], st0["sel"],
                                                  opts, st0["p2"])
                for li, hits in per_read.items():
                    results[st0["live_map"][li]] = hits
            n_m = sum(1 for hits in results if hits)
            n_t = sum(len(hits) for hits in results)
            self._bump(reads_matched=n_m, total_matches=n_t)
            return list(zip(entries, results))

        in_p1 = None     # batch with pass1 dispatched
        in_p2 = None     # batch with pass2 dispatched
        batch: list = []
        for rec in reads_iter:
            batch.append(rec)
            if len(batch) < batch_size:
                continue
            nxt = stage0(batch)
            batch = []
            if in_p2 is not None:
                yield from stage2(in_p2)
            in_p2 = stage1(in_p1) if in_p1 is not None else None
            in_p1 = nxt
        if batch:
            nxt = stage0(batch)
            if in_p2 is not None:
                yield from stage2(in_p2)
            in_p2 = stage1(in_p1) if in_p1 is not None else None
            in_p1 = nxt
        if in_p2 is not None:
            yield from stage2(in_p2)
        if in_p1 is not None:
            yield from stage2(stage1(in_p1))

    # ------------------------------------------------------------------
    # device-L3 plane capacities (expansion / post-region-filter /
    # emitted); grown in powers of two on overflow up to the max, then
    # host fallback
    DEVICE_L3_A_CAP = 1 << 21
    DEVICE_L3_A2_CAP = 1 << 17
    DEVICE_L3_A_CAP_MAX = 1 << 24
    DEVICE_L3_H_CAP = 1 << 18

    def _l3_autotune(self, entries, opts) -> bool:
        """Pick the faster L3 path by timing both once (compile excluded):
        the device kernel wins on co-located chips; the native host path
        wins through high-latency device tunnels."""
        if self._l3_choice is not None:
            return self._l3_choice == "device"
        if not self._device_l3_ok(entries, opts):
            return False                  # stay undecided until eligible
        # warm (compile) then time the device path; an OOM (Gbp-scale
        # postings may not fit HBM next to the pass-1 plane) is a
        # permanent host verdict, not a crash
        try:
            if self._candidates_device(entries, opts) is None:
                self._l3_choice = "host"
                return False
            t0 = time.time()
            self._candidates_device(entries, opts)
            t_dev = time.time() - t0
        except Exception:
            self._bump(device_l3_fallbacks=1)
            self._l3_choice = "host"
            self._dev_l3 = None
            return False
        saved, self.cfg.device_candidates = self.cfg.device_candidates, False
        t0 = time.time()
        try:
            sub = entries[: max(len(entries) // 4, 1)]
            for st in (0, 1):
                if not (self.cfg.strand_mask >> st) & 1:
                    continue
                ab = cb.anchors_batch(
                    sub, self.index, st,
                    collapse=opts.anchor_list.collapse,
                    list_cutoff=self.index.list_cutoff,
                    use_region_counts=opts.anchor_list.use_region_counts)
                cb.hit_list_batch(sub, self.index, ab, opts.hit_list,
                                  self.cfg)
        finally:
            self.cfg.device_candidates = saved
        t_host = (time.time() - t0) * (len(entries) / max(len(sub), 1))
        self._l3_choice = "device" if t_dev < t_host else "host"
        if self._l3_model is not None:   # measured verdict for the JSON
            self._l3_model["t_dev_batch"] = round(t_dev, 3)
            self._l3_model["t_host_batch"] = round(t_host, 3)
        return self._l3_choice == "device"

    def _device_l3_ok(self, entries, opts) -> bool:
        """Static eligibility for the on-device candidate path (int32
        capacity contract, ops/candidates_device.py)."""
        if not self.cfg.device_candidates:
            return False
        if any(e.sqf is not None for e in entries):
            return False      # seed-qual-filter runs on the host path
        if self.index.total_len >= (1 << 31):
            return False
        if len(entries) > (1 << 12):
            return False
        if opts.hit_list.match_mode == 3:          # paired heavy-mp path
            return False
        # no region-table size gate: past DENSE_REGION_TABLE_MAX entries
        # the kernel switches to the sparse sort formulation, so Gbp
        # genomes stay eligible (VERDICT r2 #3) — but the one-time CSR
        # ship to HBM must amortize.  Past the immediate budget the
        # decision becomes a lazy ski-rental crossover (VERDICT r4 #3):
        # ship once the host-L3 seconds already spent (or projected from
        # an expected_reads hint) exceed the estimated ship cost times
        # the amortize factor — a one-time ship then pays for itself on
        # any sufficiently long run.
        if self.cfg.device_candidates != True:  # noqa: E712  ("auto")
            ship_bytes = 4 * sum(
                len(self.index.positions[sn]) + len(self.index.offsets[sn])
                for sn in range(len(self.index.offsets)))
            est = ship_bytes / self._ship_bandwidth()
            spent = (self.tel.stages["anchor_list"].secs
                     + self.tel.stages["hit_list"].secs)
            self._l3_model = {
                "ship_bytes": ship_bytes,
                "ship_est_secs": round(est, 2),
                "host_l3_secs_spent": round(spent, 2),
                "amortize_factor": self.cfg.device_l3_amortize_factor,
            }
            if ship_bytes > self.cfg.device_l3_hbm_budget_bytes:
                self._l3_choice = "host"
                self._l3_reason = (
                    f"postings {ship_bytes / 1e9:.1f}GB exceed "
                    f"{self.cfg.device_l3_hbm_budget_bytes / 1e9:.0f}GB "
                    "HBM residency budget")
                return False
            if est > self.cfg.device_l3_ship_budget_secs:
                bar = est * self.cfg.device_l3_amortize_factor
                reads_seen = self.stats["reads"]
                if self.cfg.expected_reads and reads_seen:
                    per_read = spent / reads_seen
                    projected = per_read * float(self.cfg.expected_reads)
                    self._l3_model["host_l3_secs_projected"] = \
                        round(projected, 2)
                    if projected < bar:
                        # enough batches measured -> the projection is
                        # stable; make the verdict permanent
                        if reads_seen >= 4096:
                            self._l3_choice = "host"
                        self._l3_reason = (
                            f"projected host L3 {projected:.1f}s over "
                            f"{self.cfg.expected_reads} reads < "
                            f"{bar:.0f}s amortized ship")
                        return False
                elif spent < bar:
                    self._l3_reason = (
                        f"deferred ship: host L3 spent {spent:.1f}s < "
                        f"{bar:.0f}s (ski-rental crossover, "
                        f"ship ~{est:.0f}s)")
                    return False
                self._l3_reason = None   # crossover reached: ship below
        return True

    def _ship_bandwidth(self) -> float:
        """Measured host->HBM bytes/s (one 32 MB probe per process)."""
        global _SHIP_BW
        if _SHIP_BW is None:
            import jax
            import jax.numpy as jnp
            probe = np.ones(1 << 25, np.int8)
            jnp.asarray(probe[: 1 << 20]).block_until_ready()   # warm path
            t0 = time.time()
            jnp.asarray(probe).block_until_ready()
            _SHIP_BW = max(probe.nbytes / max(time.time() - t0, 1e-6), 1.0)
        return _SHIP_BW

    def _candidates_device(self, entries, opts):
        """The production on-device L3: bit-exact vs the host path, with
        whole-batch host fallback on capacity overflow (counted)."""
        from shrimp_tpu.ops import candidates_device as cdv
        if self._dev_l3 is None:
            _t0 = time.time()
            self._dev_l3 = cdv.DeviceL3Index.from_host(self.index)
            if self._l3_model is not None:
                self._l3_model["ship_secs_actual"] = \
                    round(time.time() - _t0, 2)
        B = len(entries)
        NB = _bucket_rows(B, lo=256)
        R = _round_up(max(e.read_len for e in entries), 16)
        codes = {0: np.zeros((NB, R), np.int8), 1: np.zeros((NB, R), np.int8)}
        rlen = np.zeros(NB, np.int32)
        minpos = np.zeros(NB, np.int32)
        wlen = np.zeros(NB, np.int32)
        thr = np.zeros(NB, np.int32)
        p = self.cfg.params
        t = opts.hit_list.threshold
        for b, e in enumerate(entries):
            codes[0][b, :e.read_len] = e.read[0]
            codes[1][b, :e.read_len] = e.read[1]
            rlen[b] = e.read_len
            minpos[b] = e.min_kmer_pos
            wlen[b] = e.window_len
            if t >= 0:
                thr[b] = int(min(e.read_len, e.window_len) * p.match
                             * (t / 100.0))
        lc = min(int(self.index.list_cutoff), 0x7FFFFFFF)
        n_regions = (self.index.total_len >> cb.REGION_BITS) + 1

        parts = []
        for st in (0, 1):
            if not (self.cfg.strand_mask >> st) & 1:
                continue
            while True:
                a_cap = self._dev_l3_a_cap
                a2_cap = self._dev_l3_a2_cap
                out = cdv.device_candidates(
                    codes[st], rlen, minpos, wlen, thr, self._dev_l3,
                    a_cap=a_cap, a2_cap=a2_cap,
                    h_cap=self.DEVICE_L3_H_CAP,
                    n_regions=n_regions,
                    use_region_counts=opts.anchor_list.use_region_counts,
                    region_bits=cb.REGION_BITS,
                    region_overlap=cb.REGION_OVERLAP,
                    collapse=opts.anchor_list.collapse,
                    gapless=opts.hit_list.gapless,
                    match_mode=opts.hit_list.match_mode,
                    threshold=float(t),
                    match=p.match, b_gap_open=p.b_gap_open,
                    b_gap_extend=p.b_gap_extend,
                    list_cutoff=lc,
                    num_contigs=self.index.num_contigs)
                if not bool(out["overflow"]):
                    break
                grew = False
                if int(out["n_total"]) > a_cap and \
                        a_cap < self.DEVICE_L3_A_CAP_MAX:
                    self._dev_l3_a_cap = a_cap << 1
                    grew = True
                if int(out["n_survivors"]) > a2_cap and \
                        a2_cap < self.DEVICE_L3_A_CAP_MAX:
                    self._dev_l3_a2_cap = a2_cap << 1
                    grew = True
                if not grew:
                    self._bump(device_l3_fallbacks=1)
                    return None                    # host fallback
            n = int(out["n"])
            cols = {f: np.asarray(out[f])[:n]
                    for f in ("rid", "cn", "g_off", "w_len",
                              "score_window_gen", "matches", "score_max",
                              "anchor_x", "anchor_y", "anchor_length",
                              "anchor_width")}
            order = np.lexsort((cols["g_off"], cols["cn"], cols["rid"]))
            parts.append(cb.HitBatch(
                rid=cols["rid"][order].astype(np.int32),
                st=np.full(n, st, np.int8),
                cn=cols["cn"][order].astype(np.int32),
                g_off=cols["g_off"][order].astype(np.int64),
                w_len=cols["w_len"][order].astype(np.int32),
                score_window_gen=cols["score_window_gen"][order]
                .astype(np.int32),
                matches=cols["matches"][order].astype(np.int32),
                score_max=cols["score_max"][order].astype(np.int32),
                anchor_x=cols["anchor_x"][order].astype(np.int64),
                anchor_y=cols["anchor_y"][order].astype(np.int64),
                anchor_length=cols["anchor_length"][order].astype(np.int32),
                anchor_width=cols["anchor_width"][order].astype(np.int32)))
        return parts

    def _candidates(self, entries, opts) -> cb.HitBatch:
        parts = None
        use_device = self.cfg.device_candidates
        if use_device == "auto":
            use_device = self._l3_autotune(entries, opts)
        if use_device and self._device_l3_ok(entries, opts):
            with self.tel.stage("anchor_list"):
                parts = self._candidates_device(entries, opts)
        if parts is None:
            parts = []
            for st in (0, 1):
                if not (self.cfg.strand_mask >> st) & 1:
                    continue
                # region_counts ride inside the fused native anchor
                # construction (anchors_from_csr) when available, so they
                # are accounted under the anchor_list stage timer
                with self.tel.stage("anchor_list"):
                    ab = cb.anchors_batch(
                        entries, self.index, st,
                        collapse=opts.anchor_list.collapse,
                        list_cutoff=self.index.list_cutoff,
                        use_region_counts=opts.anchor_list
                        .use_region_counts)
                with self.tel.stage("hit_list"):
                    parts.append(cb.hit_list_batch(entries, self.index, ab,
                                                   opts.hit_list, self.cfg))
        merged = cb.HitBatch(**{
            f: np.concatenate([getattr(h, f) for h in parts])
            for f in ("rid", "st", "cn", "g_off", "w_len",
                      "score_window_gen", "matches", "score_max",
                      "anchor_x", "anchor_y", "anchor_length",
                      "anchor_width")})
        return merged

    # ------------------------------------------------------------------
    def _reads2_matrix(self, entries, R) -> np.ndarray:
        """Padded per-read code planes int8 [B, 2, R] (both strands)."""
        out = np.full((len(entries), 2, R), sw_vector.READ_PAD, np.int8)
        for b, e in enumerate(entries):
            out[b, 0, :e.read_len] = e.read[0]
            out[b, 1, :e.read_len] = e.read[1]
        return out

    def _reads_matrix(self, entries, rid, st, R) -> np.ndarray:
        """Per-window read rows int8 [N, R]: one vectorized take by
        (rid, st) from the [B, 2, R] batch plane (the former per-window
        Python loop was ~25x slower at million-window batches)."""
        return self._reads2_matrix(entries, R)[rid, st]

    def _gapless_scores(self, entries, rid, st, cn, g_off_pos, ax, ay,
                        al, aw, w_len, R: int, NB: int, sync: bool = True):
        """Pass-1 gapless scores: sw_gapless along the anchor diagonal
        (f1_run with gapless=true, f1-wrapper.h:118-120; sw-gapless.c:58).

        g_idx = g_off + anchor.x, r_idx = anchor.y in the hit's genome-strand
        frame (read_pass1_per_strand, mapping.c:1335-1348); CS applies the
        reverse_hit framing and the forced-first-colour rule first."""
        from shrimp_tpu.ops import sw_gapless
        cfg = self.cfg
        coff = self.index.contig_offsets[cn]
        clen = self.index.contig_len[cn]
        rlen = np.array([entries[r].read_len for r in rid], np.int64)
        wl = w_len.astype(np.int64)
        ax = ax.astype(np.int64)
        ay = ay.astype(np.int64)
        cols = np.arange(R, dtype=np.int64)[None, :]

        def diag_rows(plane, g_left):
            gi = g_left[:, None] + cols
            src = np.minimum(coff[:, None] + gi, len(plane) - 1)
            out = plane[src]
            return np.where(gi < clen[:, None], out,
                            np.int8(sw_gapless.GENOME_PAD)).astype(np.int8)

        def read_rows(istrand_arr, r_left):
            rb = self._reads_matrix(entries, rid, istrand_arr, R)
            rb = np.concatenate(
                [rb, np.full((len(rid), 1), sw_gapless.READ_PAD, np.int8)],
                axis=1)
            ri = np.minimum(r_left[:, None] + cols, R)
            return np.take_along_axis(rb, ri, axis=1)

        if not cfg.colour_space:
            g_idx = g_off_pos.astype(np.int64) + ax
            d0 = g_idx - ay
            g_left = np.maximum(d0, 0)
            r_left = np.maximum(-d0, 0)
            diag = diag_rows(self.index.genome, g_left)
            rrow = read_rows(st, r_left)
            diag = _pad_rows(diag, NB, sw_gapless.GENOME_PAD)
            rrow = _pad_rows(rrow, NB, sw_gapless.READ_PAD)
            dev = sw_gapless.gapless_score_batch(diag, rrow,
                                                 self.vect_params)
            if not sync:
                return [(dev, len(rid))]
            return np.asarray(dev)[:len(rid)].astype(np.int64)

        # ---- colour space: reverse_hit framing (mapping.c:272-281);
        # CS input strand is always 0 (the read as given) ----
        istrand = np.zeros(len(rid), np.int8)
        rev = st != istrand
        goff_f = np.where(rev, clen - g_off_pos - wl, g_off_pos)
        al = al.astype(np.int64)
        aw = aw.astype(np.int64)
        ax_f = np.where(rev, -ax + (wl - 1) - (al - 1) - (aw - 1), ax)
        ay_f = np.where(rev, -ay + (rlen - 1) - (al - 1) + (aw - 1), ay)
        g_idx = goff_f + ax_f
        d0 = g_idx - ay_f
        g_left = np.maximum(d0, 0)
        r_left = np.maximum(-d0, 0)
        diag_cs = np.where(
            rev[:, None],
            diag_rows(self.genome_cs_rc, g_left),
            diag_rows(self.genome_cs, g_left))
        diag_ls = np.where(
            rev[:, None],
            diag_rows(self.genome_rc, g_left),
            diag_rows(self.index.genome, g_left))
        rrow = read_rows(istrand, r_left)
        # forced first colour when the diagonal starts at read position 0
        # (sw-gapless.c:85-95): lstocs(genome_ls[g], initbp) vs read[0]
        initbp = np.array([entries[r].initbp for r in rid], np.int8)
        gl0 = diag_ls[:, 0]
        real_colour = np.where((gl0 >= 0) & (gl0 <= 3), gl0 ^ initbp,
                               np.int8(dna.BASE_N))
        forced = r_left == 0
        p = self.vect_params
        s0 = np.where(
            forced,
            np.where(real_colour == rrow[:, 0], np.int32(p.match), 0),
            np.where(
                (diag_cs[:, 0] != sw_gapless.GENOME_PAD)
                & (rrow[:, 0] != sw_gapless.READ_PAD),
                np.where(diag_cs[:, 0] == rrow[:, 0],
                         np.int32(p.match), np.int32(p.mismatch)),
                0)).astype(np.int32)
        diag_cs = _pad_rows(diag_cs.astype(np.int8), NB,
                            sw_gapless.GENOME_PAD)
        rrow = _pad_rows(rrow, NB, sw_gapless.READ_PAD)
        s0 = _pad_rows(s0, NB, 0)
        dev = sw_gapless.gapless_score_batch(diag_cs, rrow, p, s0=s0)
        if not sync:
            return [(dev, len(rid))]
        return np.asarray(dev)[:len(rid)].astype(np.int64)

    def _pass1_dispatch(self, entries, hb: cb.HitBatch, opts):
        """Dispatch the pass-1 vector-SW kernel; returns a context whose
        device handle is still in flight (async JAX dispatch)."""
        keep = hb.matches >= opts.pass1.min_matches
        if not keep.any():
            return None
        idxs = np.flatnonzero(keep)
        rid = hb.rid[idxs]
        st = hb.st[idxs]
        # coarse shape buckets: every distinct (G, R, chunk) combination
        # is a separate XLA compile (~25 s through the remote-compile
        # tunnel, and it lands mid-run when a later batch's max window
        # exceeds the warmup's); G rides the 128-lane pad the kernels
        # apply anyway, so a 128-multiple costs nothing extra
        G = _round_up(max(1, int(hb.w_len[idxs].max())), 128)
        R = _round_up(max(e.read_len for e in entries), 8)
        NB = _bucket_rows(len(idxs))
        if opts.pass1.gapless:
            dev = self._gapless_scores(
                entries, rid, st, hb.cn[idxs], hb.g_off[idxs],
                hb.anchor_x[idxs], hb.anchor_y[idxs],
                hb.anchor_length[idxs], hb.anchor_width[idxs],
                hb.w_len[idxs], R, NB, sync=False)
        else:
            dev = self._vector_scores(
                entries, rid, st, hb.cn[idxs], hb.g_off[idxs],
                hb.w_len[idxs], np.zeros(len(rid), np.int8), G, R, NB,
                sync=False)
        return {"idxs": idxs, "rid": rid, "st": st, "dev": dev, "R": R}

    def _pass1(self, entries, hb: cb.HitBatch, opts):
        """Vector SW scores + overlap suppression + per-read top-k.

        Returns dict of column arrays of the selected hits, or None."""
        ctx = self._pass1_dispatch(entries, hb, opts)
        if ctx is None:
            return None
        return self._pass1_finish(entries, hb, opts, ctx)

    def _pass1_finish(self, entries, hb: cb.HitBatch, opts, ctx):
        cfg = self.cfg
        idxs = ctx["idxs"]
        rid = ctx["rid"]
        st = ctx["st"]
        _t0 = time.time()
        scores = np.concatenate(
            [np.asarray(d)[:n] for d, n in ctx["dev"]]).astype(np.int64)
        _f1_secs = time.time() - _t0
        score_max = hb.score_max[idxs].astype(np.int64)
        if opts.pass1.threshold >= 0:
            # (int)abs_or_pct truncation (read_pass1_per_strand,
            # mapping.c:1353) — the float product is cast, not rounded
            thr = (score_max
                   * (opts.pass1.threshold / 100.0)).astype(np.int64)
        else:
            thr = np.full(len(idxs), int(-opts.pass1.threshold), np.int64)

        # window-overlap suppression scan per (read, strand), in hit order
        # (read_pass1_per_strand, mapping.c:1303-1330); sequential
        # dependence -> the native C scan (Python fallback below)
        wlen_cfg = np.array([e.window_len for e in entries], np.int64)
        ovl_r = np.array([int(abs_or_pct(opts.pass1.window_overlap, w))
                          for w in wlen_cfg], np.int64)
        order_key = np.lexsort((np.arange(len(idxs)), st, rid))
        suppressed = np.zeros(len(idxs), bool)
        from shrimp_tpu import native as _native
        _clib = _native.load_candidates()
        if _clib is not None and hasattr(_clib, "pass1_suppress"):
            import ctypes as _ct
            _i64p = _ct.POINTER(_ct.c_longlong)
            _sup = np.zeros(len(idxs), np.uint8)
            _cn = np.ascontiguousarray(hb.cn[idxs], np.int32)
            _go = np.ascontiguousarray(hb.g_off[idxs], np.int64)
            _thr = np.ascontiguousarray(thr, np.int64)
            _sc = np.ascontiguousarray(scores, np.int64)
            _rid = np.ascontiguousarray(rid, np.int32)
            _st = np.ascontiguousarray(st, np.int8)
            _ord = np.ascontiguousarray(order_key, np.int64)
            _clib.pass1_suppress(
                _ord.ctypes.data_as(_i64p), len(idxs),
                _rid.ctypes.data_as(_ct.POINTER(_ct.c_int32)),
                _st.ctypes.data_as(_ct.POINTER(_ct.c_int8)),
                _cn.ctypes.data_as(_ct.POINTER(_ct.c_int32)),
                _go.ctypes.data_as(_i64p),
                _sc.ctypes.data_as(_i64p), _thr.ctypes.data_as(_i64p),
                np.ascontiguousarray(ovl_r).ctypes.data_as(_i64p),
                np.ascontiguousarray(wlen_cfg).ctypes.data_as(_i64p),
                _sup.ctypes.data_as(_ct.POINTER(_ct.c_uint8)))
            suppressed = _sup.astype(bool)
        else:
            lg_ptr = -1
            prev_rid = prev_st = None
            for n in order_key:
                r, s = rid[n], st[n]
                if (r, s) != (prev_rid, prev_st):
                    lg_ptr = -1
                    prev_rid, prev_st = r, s
                if lg_ptr >= 0 and hb.cn[idxs[n]] == hb.cn[idxs[lg_ptr]] \
                   and (hb.g_off[idxs[n]] + ovl_r[r]
                        <= hb.g_off[idxs[lg_ptr]] + wlen_cfg[r]):
                    suppressed[n] = True
                    continue
                if scores[n] >= thr[n]:
                    lg_ptr = n

        eff_scores = np.where(suppressed, 0, scores)
        # kernel telemetry: the reference invokes the filter only for
        # non-suppressed hits (read_pass1_per_strand, mapping.c:1303-1330);
        # cells = glen*rlen (sw-vector.c:509) or rlen (sw-gapless.c:105)
        _inv = int((~suppressed).sum())
        _rlen = np.array([entries[r].read_len for r in rid], np.int64)
        if opts.pass1.gapless:
            _cells = int(_rlen[~suppressed].sum())
        else:
            _cells = int((hb.w_len[idxs][~suppressed].astype(np.int64)
                          * _rlen[~suppressed]).sum())
        self.tel.f1.add(_inv, _cells, _f1_secs)
        live = eff_scores >= thr
        if not live.any():
            return None
        pct = (100000 * eff_scores) // np.maximum(score_max, 1)
        key = eff_scores if is_absolute(opts.pass1.threshold) else pct

        # per-read top-k via the reference's explicit min-heap — the heap
        # ARRAY order feeds pass2 and breaks all downstream ties
        # (read_get_vector_hits, mapping.c:1394-1432)
        with self.tel.stage("get_vector_hits"):
            ln = np.flatnonzero(live)
            # group live rows by read, stream order preserved within a
            # read (stable sort of the already-ascending row ids)
            rows_sorted = ln[np.argsort(rid[ln], kind="stable")] \
                .astype(np.int64)
            uniq_r, first = np.unique(rid[rows_sorted], return_index=True)
            bounds = np.concatenate(
                [first, [len(rows_sorted)]]).astype(np.int64)
            K = opts.pass1.num_outputs
            sel_rows = None
            if _clib is not None and hasattr(_clib, "topk_select_batch"):
                import ctypes as _ct
                _i64p = _ct.POINTER(_ct.c_longlong)
                key64 = np.ascontiguousarray(key, np.int64)
                out64 = np.empty(len(rows_sorted), np.int64)
                out_n = np.empty(len(uniq_r), np.int64)
                rc = _clib.topk_select_batch(
                    rows_sorted.ctypes.data_as(_i64p),
                    np.ascontiguousarray(bounds).ctypes.data_as(_i64p),
                    len(uniq_r), key64.ctypes.data_as(_i64p), K,
                    out64.ctypes.data_as(_i64p),
                    out_n.ctypes.data_as(_i64p))
                if rc == 0:
                    if int(out_n.sum()) == len(rows_sorted):
                        sel_rows = out64
                    else:
                        take = (np.repeat(bounds[:-1], out_n)
                                + _concat_aranges(out_n))
                        sel_rows = out64[take]
            if sel_rows is None:
                from shrimp_tpu.utils import extheap
                sel_list = []
                for g in range(len(uniq_r)):
                    sel_list.extend(extheap.topk_select(
                        rows_sorted[bounds[g]:bounds[g + 1]].tolist(),
                        key, K))
                sel_rows = np.array(sel_list, dtype=np.int64)
        src = idxs[sel_rows]
        return {
            "rid": rid[sel_rows], "st": st[sel_rows],
            "cn": hb.cn[src], "g_off": hb.g_off[src],
            "w_len": hb.w_len[src], "score_max": hb.score_max[src],
            "anchor_x": hb.anchor_x[src], "anchor_y": hb.anchor_y[src],
            "anchor_length": hb.anchor_length[src],
            "anchor_width": hb.anchor_width[src],
            "score_vector": eff_scores[sel_rows],
            "matches": hb.matches[src],
            "score_window_gen": hb.score_window_gen[src],
        }

    # ------------------------------------------------------------------
    def _pass2(self, entries, sel, opts) -> dict[int, list[FinalHit]]:
        ctx = self._pass2_dispatch(entries, sel)
        return self._pass2_finish(entries, sel, opts, ctx)

    def _pass2_dispatch(self, entries, sel):
        """Dispatch the pass-2 full-SW kernel; device handles stay in
        flight until _pass2_finish."""
        cfg = self.cfg
        N = len(sel["rid"])
        rid = sel["rid"]
        st = sel["st"]
        cn = sel["cn"]
        w_len = sel["w_len"].astype(np.int64)
        clen = self.index.contig_len[cn]
        rlen = np.array([entries[r].read_len for r in rid], np.int64)

        # reverse_hit (mapping.c:272-281)
        gen_st = st.astype(np.int64)
        g_off = np.where(gen_st == 1, clen - sel["g_off"] - w_len,
                         sel["g_off"]).astype(np.int64)
        ax = sel["anchor_x"].astype(np.int64)
        ay = sel["anchor_y"].astype(np.int64)
        al = sel["anchor_length"].astype(np.int64)
        aw = sel["anchor_width"].astype(np.int64)
        rev_mask = gen_st == 1
        ax = np.where(rev_mask, -ax + (w_len - 1) - (al - 1) - (aw - 1), ax)
        ay = np.where(rev_mask, -ay + (rlen - 1) - (al - 1) + (aw - 1), ay)

        # coarse buckets, same reason as _pass1_dispatch: stable compile
        # shapes across batches (G in 128s; the packed DP's cost scales
        # with W, not G)
        G = _round_up(max(1, int(w_len.max())), 128)
        R = _round_up(max(e.read_len for e in entries), 8)
        NB = _bucket_rows(N)
        gb_f = self._gather_windows(self.index.genome, cn, g_off, w_len, G)
        gb_r = self._gather_windows(self.genome_rc, cn, g_off, w_len, G)
        gb = np.where(rev_mask[:, None], gb_r, gb_f)
        rb = self._reads_matrix(entries, rid, np.zeros(N, np.int8), R)
        rev = rev_mask & cfg.rev_tiebreak

        # f2 telemetry: banded cell count per row (sw-full-ls.c:237,
        # sw-full-cs.c:327); full rows when banding is disabled
        _f2_cells = None
        band_xmin = band_xmax = None
        if cfg.anchor_width >= 0:
            # anchor_widen (sw-full-ls.c:175-178)
            bx = ax - cfg.anchor_width // 2
            by = ay + cfg.anchor_width // 2
            bw = aw + cfg.anchor_width
            band_xmin, band_xmax = sw_full.compute_band(bx, by, al, bw,
                                                        w_len, R)
            _rows = np.arange(R)[None, :] < rlen[:, None]
            _f2_cells = np.where(
                _rows, band_xmax.astype(np.int64) - band_xmin + 1,
                0).sum(axis=1)
            band_xmin = _pad_rows(band_xmin, NB, 0)
            band_xmax = _pad_rows(band_xmax, NB, 0)

        gb = _pad_rows(gb, NB, sw_vector.GENOME_PAD)
        rb = _pad_rows(rb, NB, sw_vector.READ_PAD)
        rev = _pad_rows(rev, NB, False)

        crossovers = None
        if cfg.colour_space:
            from shrimp_tpu.ops import sw_full_cs
            qr4 = np.full((N, 4, R), sw_vector.READ_PAD, np.int8)
            xover = np.full((N, R), cfg.params.crossover, np.int32)
            for n, r in enumerate(rid):
                e = entries[r]
                qr4[n, :, :e.read_len] = e.read_ls4
                if e.crossover_score is not None:
                    xover[n, :e.read_len] = e.crossover_score
            qr4 = _pad_rows(qr4, NB, sw_vector.READ_PAD)
            xover = _pad_rows(xover, NB, cfg.params.crossover)
            Wp = (_round_up(int((band_xmax - band_xmin).max()) + 1, 32)
                  if band_xmin is not None else None)
            if Wp is not None and Wp < G:
                # band-packed 4-layer DP: R-step row scan over [B, 4, W]
                # planes instead of G+R-1 diagonals over [B, 4, R]
                # (sw-full-cs.c:327 banded row loop, "necks")
                stats_d, ops_d = \
                    sw_full_cs.sw_full_cs_and_traceback_packed_jax(
                        gb, qr4, xover, rev, band_xmin, band_xmax,
                        cfg.params,
                        local_alignment=not cfg.global_alignment,
                        taboo_len=cfg.indel_taboo_len, W=Wp)
            else:
                stats_d, ops_d = sw_full_cs.sw_full_cs_and_traceback_jax(
                    gb, qr4, xover, rev, cfg.params,
                    local_alignment=not cfg.global_alignment,
                    taboo_len=cfg.indel_taboo_len,
                    band_xmin=band_xmin, band_xmax=band_xmax)
        else:
            qr4 = None
            Wp = (_round_up(int((band_xmax - band_xmin).max()) + 1, 32)
                  if band_xmin is not None else None)
            if Wp is not None and Wp < G:
                # band-packed DP: R-step scan over [B, W] planes instead
                # of (G+R-1) diagonals over [B, R], and a (R, B, W) bits
                # plane for the traceback (sw-full-ls.c "necks")
                stats_d, ops_d = sw_full.sw_full_and_traceback_packed_jax(
                    gb, rb, rev, band_xmin, band_xmax, cfg.params,
                    local_alignment=not cfg.global_alignment, W=Wp)
            else:
                stats_d, ops_d = sw_full.sw_full_and_traceback_jax(
                    gb, rb, rev, cfg.params,
                    local_alignment=not cfg.global_alignment,
                    band_xmin=band_xmin, band_xmax=band_xmax)
        if _f2_cells is None:
            _f2_cells = w_len * rlen
        if not cfg.colour_space:
            # LS pass2 re-runs the vector filter per hit before the scalar
            # DP (hit_run_full_sw, mapping.c:400-415) — account it under f1
            self.tel.f1.add(N, int((w_len * rlen).sum()))
        return {"stats_d": stats_d, "ops_d": ops_d, "qr4": qr4, "gb": gb,
                "N": N, "gen_st": gen_st, "g_off": g_off, "w_len": w_len,
                "cn": cn, "f2_cells_rows": np.asarray(_f2_cells, np.int64),
                "t_dispatch": time.time()}

    def _pass2_finish(self, entries, sel, opts, ctx):
        cfg = self.cfg
        N = ctx["N"]
        rid = sel["rid"]
        qr4 = ctx["qr4"]
        gen_st = ctx["gen_st"]
        g_off = ctx["g_off"]
        w_len = ctx["w_len"]
        cn = ctx["cn"]
        _t0 = time.time()
        stats = np.asarray(ctx["stats_d"])[:N]
        self.tel.f2.secs += time.time() - _t0
        # scalar-SW invocations: in LS the reference only runs sw_full_ls
        # when the per-hit vector re-score clears the pass2 threshold
        # (mapping.c:406-415); that re-score equals the pass1 vector score
        _smax = sel["score_max"].astype(np.int64)
        if cfg.colour_space or self.cfg.gapless:
            _qual = np.ones(N, bool)
        else:
            _thr = np.array([abs_or_pct(opts.pass2.threshold, s)
                             for s in _smax])
            _qual = sel["score_vector"].astype(np.int64) >= _thr
        self.tel.f2.add(int(_qual.sum()),
                        int(ctx["f2_cells_rows"][_qual].sum()))
        crossovers = stats[:, 10] if cfg.colour_space else None
        # NOTE: slicing ops_d to the used columns before the fetch was
        # measured a net LOSS through the high-latency tunnel (the slice
        # adds a dispatch + sync that breaks pipeline overlap: pass2
        # stage 10.9s -> 18.5s at the 1 Gbp bench) — fetch the full plane
        ops_all = np.asarray(ctx["ops_d"])[:N]
        score = stats[:, 0]
        tb = {"read_start": stats[:, 1], "genome_start": stats[:, 2],
              "matches": stats[:, 3], "mismatches": stats[:, 4],
              "insertions": stats[:, 5], "deletions": stats[:, 6],
              "rmapped": stats[:, 7], "gmapped": stats[:, 8],
              "ops_len": stats[:, 9], "ops": ops_all}
        gb_np = np.asarray(ctx["gb"])

        # --- selection per read (read_pass2) ---
        out: dict[int, list[FinalHit]] = {}
        score_max = sel["score_max"].astype(np.int64)
        grp_order = np.argsort(rid, kind="stable")
        grp_bounds = np.searchsorted(rid[grp_order],
                                     np.unique(rid))
        uniq = np.unique(rid)

        # CS: collect raw-threshold survivors first, run the posterior HMM
        # for all of them in one vectorized batch (bit-equal to the per-hit
        # pass), then finalize below
        cs_posteriors: dict[int, tuple[float, str]] = {}
        cs_renders: dict[int, tuple[str, str]] = {}
        if cfg.colour_space:
            from shrimp_tpu.ops import post_sw as post_sw_mod
            from shrimp_tpu.ops import sw_full_cs
            items = []
            item_rows = []
            for n in range(len(rid)):
                s = int(score[n])
                if s <= 0:
                    continue
                thresh = abs_or_pct(opts.pass2.threshold, score_max[n])
                if s < thresh:
                    continue
                ops_n = tb["ops"][n, :tb["ops_len"][n]]
                e = entries[rid[n]]
                dbal, qral = sw_full_cs.render_alignment_cs(
                    ops_n, gb_np[n], np.asarray(qr4[n]),
                    int(tb["genome_start"][n]), int(tb["read_start"][n]))
                cs_renders[n] = (dbal, qral)
                if cfg.compute_mapping_qualities:
                    q_in = (None if (e.qual is None or cfg.ignore_qvs)
                            else e.qual)
                    items.append({"colours": e.read[0], "initbp": e.initbp,
                                  "qual": q_in,
                                  "read_start": int(tb["read_start"][n]),
                                  "dbalign": dbal, "qralign": qral})
                    item_rows.append(n)
            if items:
                _t0 = time.time()
                res = post_sw_mod.post_sw_batch(
                    items, self.probs, qual_delta=cfg.qual_delta,
                    qual_vector_offset=cfg.qual_vector_offset)
                # post_sw: cells = 16 * alignment columns (sw-post.c:716)
                self.tel.fwbw.add(
                    len(items),
                    16 * sum(len(it["dbalign"]) for it in items),
                    time.time() - _t0)
                for n, r in zip(item_rows, res):
                    cs_posteriors[n] = r

        for gi, li in enumerate(uniq):
            lo = grp_bounds[gi]
            hi = grp_bounds[gi + 1] if gi + 1 < len(uniq) else len(rid)
            rows = grp_order[lo:hi]
            finals: list[FinalHit] = []
            for n in rows:
                s = int(score[n])
                if s <= 0:
                    continue
                thresh = abs_or_pct(opts.pass2.threshold, score_max[n])
                rmapped = int(tb["rmapped"][n])
                ops_n = tb["ops"][n, :tb["ops_len"][n]].copy()
                if cfg.colour_space:
                    # sw_full_cs itself zeroes sub-threshold raw scores
                    # (sw-full-cs.c:1215-1223)
                    if s < thresh:
                        continue
                    dbal, qral = cs_renders[n]
                    qual33 = None
                    if cfg.compute_mapping_qualities:
                        posterior, qual33 = cs_posteriors[n]
                        score_full = mapq.posterior_score(posterior, rmapped,
                                                          self.probs)
                        if score_full < thresh:
                            continue
                    else:
                        posterior = 0.0
                        score_full = s
                else:
                    dbal = qral = ""
                    qual33 = None
                    posterior = mapq.ls_posterior(s, rmapped, self.probs)
                    ps = mapq.posterior_score(posterior, rmapped, self.probs)
                    score_full = ps if cfg.compute_mapping_qualities else s
                    if score_full < thresh:
                        continue
                pct = (100000 * score_full) // int(score_max[n])
                key = (score_full if is_absolute(opts.pass2.threshold)
                       else pct)
                finals.append(FinalHit(
                    cn=int(cn[n]), gen_st=int(gen_st[n]), g_off=int(g_off[n]),
                    w_len=int(w_len[n]), score_full=score_full, sw_score=s,
                    pass2_key=key, posterior=posterior,
                    read_start=int(tb["read_start"][n]),
                    genome_start=int(tb["genome_start"][n]),
                    rmapped=rmapped, gmapped=int(tb["gmapped"][n]),
                    matches=int(tb["matches"][n]),
                    mismatches=int(tb["mismatches"][n]),
                    insertions=int(tb["insertions"][n]),
                    deletions=int(tb["deletions"][n]),
                    ops=ops_n,
                    score_max=int(score_max[n]),
                    crossovers=(int(crossovers[n]) if crossovers is not None
                                else 0),
                    dbalign=dbal, qralign=qral, qual33=qual33,
                    kmer_matches=int(sel["matches"][n]),
                    score_window_gen=int(sel["score_window_gen"][n]),
                    score_vector=int(sel["score_vector"][n])))
            kept = self._select_hits(finals, opts)
            if kept:
                out[int(li)] = kept
        return out

    # ------------------------------------------------------------------
    def _select_hits(self, finals: list[FinalHit],
                     opts: ReadMappingOptions,
                     compute_mqv: bool | None = None) -> list[FinalHit]:
        """Dedup, sort, trim, strata, max-alignments, MQV
        (read_pass2, mapping.c:1690-1763).  compute_mqv overrides the
        config flag (the paired mapper computes its own class-based MQVs)
        without mutating shared state."""
        cfg = self.cfg
        if compute_mqv is None:
            compute_mqv = cfg.compute_mapping_qualities

        def gen_start_key(fh: FinalHit):
            return (fh.cn, fh.gen_st, fh.g_off + fh.genome_start)

        def gen_end_key(fh: FinalHit):
            gstart = fh.g_off + fh.genome_start
            return (fh.cn, fh.gen_st,
                    -gstart - fh.rmapped + fh.deletions - fh.insertions)

        if len(finals) == 1:
            dedup = finals
            if opts.pass2.strata:
                pass                      # single hit: strata is a no-op
            if cfg.max_alignments and 1 > cfg.max_alignments:
                self._bump(reads_dropped_max_aln=1)
                return []
            if compute_mqv:
                mqvs, z1 = mapq.compute_unpaired_mqv(
                    [finals[0].posterior])
                finals[0].mqv = mqvs[0]
                finals[0].z0 = finals[0].posterior
                finals[0].z1 = z1
            return finals

        def dedup_by(hits: list[FinalHit], keyf) -> list[FinalHit]:
            hits = sorted(hits, key=keyf)
            outl: list[FinalHit] = []
            i = 0
            while i < len(hits):
                j = i
                best = i
                while j < len(hits) and keyf(hits[j]) == keyf(hits[i]):
                    if hits[j].pass2_key > hits[best].pass2_key:
                        best = j
                    j += 1
                outl.append(hits[best])
                i = j
            return outl

        with self.tel.stage("duplicate_removal"):
            dedup = dedup_by(dedup_by(finals, gen_start_key), gen_end_key)
        if len(dedup) < len(finals):
            self._bump(dup_matches_pruned=len(finals) - len(dedup))
        dedup.sort(key=lambda fh: -fh.pass2_key)
        dedup = dedup[:opts.pass2.num_outputs]

        if opts.pass2.strata and dedup:
            top = dedup[0].score_full
            dedup = [fh for fh in dedup if fh.score_full == top]

        if dedup and cfg.max_alignments and len(dedup) > cfg.max_alignments:
            self._bump(reads_dropped_max_aln=1)
            return []

        if compute_mqv and dedup:
            mqvs, z1 = mapq.compute_unpaired_mqv(
                [fh.posterior for fh in dedup])
            for fh, m in zip(dedup, mqvs):
                fh.mqv = m
                fh.z0 = fh.posterior
                fh.z1 = z1
        return dedup

    # ------------------------------------------------------------------
    def render_hit_alignment(self, re: cand.ReadEntry,
                             fh: FinalHit) -> tuple[str, str]:
        """dbalign/qralign strings for one hit (rendered lazily; CS hits
        carry them from the CS traceback already)."""
        if fh.qralign:
            return fh.dbalign, fh.qralign
        plane = self.genome_rc if fh.gen_st == 1 else self.index.genome
        lo = int(self.index.contig_offsets[fh.cn]) + fh.g_off
        window = plane[lo:lo + fh.w_len]
        res = sw_full.SWAlignment(
            score=fh.sw_score, read_start=fh.read_start,
            genome_start=fh.genome_start, ops=fh.ops)
        sw_full.render_alignment(res, window, re.read[0])
        return res.dbalign, res.qralign

    def legacy_record(self, re: cand.ReadEntry, fh: FinalHit,
                      include_read: bool) -> str:
        """One legacy SHRiMP-format line (hit_output !Eflag branch,
        gmapper/output.c:272-295)."""
        from shrimp_tpu.io import legacy
        dbal, qral = self.render_hit_alignment(re, fh)
        read_seq = None
        if include_read:
            if self.cfg.colour_space:
                read_seq = (dna.decode([re.initbp])
                            + dna.decode(re.read[0], dna.COLOUR_SPACE))
            else:
                read_seq = dna.decode(re.read[0])
        return legacy.output_normal(
            re.name, self.index.contig_names[fh.cn],
            genome_start0=fh.g_off + fh.genome_start, gmapped=fh.gmapped,
            read_start0=fh.read_start, rmapped=fh.rmapped,
            read_length=re.read_len, score=fh.score_full,
            dbalign=dbal, qralign=qral,
            genome_len=int(self.index.contig_len[fh.cn]),
            revcmpl=fh.gen_st == 1, read_seq=read_seq)

    def legacy_pretty_block(self, re: cand.ReadEntry, fh: FinalHit) -> str:
        """output_pretty block for one hit (hit_output Pflag branch)."""
        from shrimp_tpu.io import legacy
        dbal, qral = self.render_hit_alignment(re, fh)
        plane = self.genome_rc if fh.gen_st == 1 else self.index.genome
        lo = int(self.index.contig_offsets[fh.cn])
        clen = int(self.index.contig_len[fh.cn])
        return legacy.output_pretty(
            genome_plane=plane[lo:lo + clen], genome_len=clen,
            genome_start0=fh.g_off + fh.genome_start, gmapped=fh.gmapped,
            read_start0=fh.read_start, rmapped=fh.rmapped,
            read_len=re.read_len, dbalign=dbal, qralign=qral,
            revcmpl=fh.gen_st == 1, colour_space=self.cfg.colour_space,
            read_text_cs=re.seq if self.cfg.colour_space else None)

    def legacy_records(self, re: cand.ReadEntry, hits: list[FinalHit],
                       include_read: bool = False,
                       pretty: bool = False) -> list[str]:
        if not hits:
            return [f">{re.name}"] if self.cfg.sam_unaligned else []
        sel = hits
        if self.cfg.single_best_mapping and self.cfg.compute_mapping_qualities:
            best = max(range(len(hits)), key=lambda i: hits[i].mqv)
            sel = [hits[best]]
        out = []
        for fh in sel:
            out.append(self.legacy_record(re, fh, include_read))
            if pretty:
                out.append(self.legacy_pretty_block(re, fh))
        return out

    # ------------------------------------------------------------------
    def _append_tail_tags(self, rec, re_e, fh, mate_re=None) -> None:
        """R2/X2, RG:Z and --extra-sam-fields tags, in the reference's
        order (output.c:452-464, 731-756)."""
        cfg = self.cfg
        if cfg.sam_r2 and mate_re is not None:
            tag = "X2" if cfg.colour_space else "R2"
            rec.tags.append(f"{tag}:Z:{mate_re.seq}")
        if cfg.sam_read_group_name:
            rec.tags.append(f"RG:Z:{cfg.sam_read_group_name}")
        if cfg.extra_sam_fields and fh is not None:
            from shrimp_tpu.io import legacy
            db, qr = self.render_hit_alignment(re_e, fh)
            es = legacy.alignment_edit_string(db, qr)
            if fh.gen_st == 1:
                es = legacy.reverse_alignment_edit_string(es)
            rec.tags.append(
                f"ZM:i:{fh.kmer_matches}\tZR:i:{fh.score_window_gen}\t"
                f"ZV:i:{fh.score_vector}\tZH:i:{fh.sw_score}\tZE:Z:{es}")

    def sam_records(self, re: cand.ReadEntry,
                    hits: list[FinalHit]) -> list[sam.SamRecord]:
        """read_output + hit_output for one read."""
        cfg = self.cfg
        recs = []
        if not hits:
            if cfg.sam_unaligned:
                if cfg.colour_space:
                    recs.append(sam.unaligned_record_cs(re.name, re.seq,
                                                        re.qual))
                else:
                    recs.append(sam.unaligned_record(re.name, re.seq, re.qual,
                                                     cfg.qual_delta))
                self._append_tail_tags(recs[-1], re, None)
            return recs
        sel = hits
        if cfg.single_best_mapping and cfg.compute_mapping_qualities:
            best = max(range(len(hits)), key=lambda i: hits[i].mqv)
            sel = [hits[best]]
        if cfg.colour_space:
            for fh in sel:
                recs.append(sam.aligned_record_cs(
                    name=re.name,
                    seq_text=re.seq,
                    qual_raw=re.qual,
                    contig_name=self.index.contig_names[fh.cn],
                    contig_len=int(self.index.contig_len[fh.cn]),
                    genome_start0=fh.g_off + fh.genome_start,
                    read_start0=fh.read_start,
                    rmapped=fh.rmapped, gmapped=fh.gmapped,
                    insertions=fh.insertions, deletions=fh.deletions,
                    mismatches=fh.mismatches,
                    ops=fh.ops, qralign=fh.qralign,
                    qual33=(fh.qual33
                            if cfg.compute_mapping_qualities else None),
                    crossovers=fh.crossovers,
                    bfast=cfg.bfast,
                    reverse_strand=fh.gen_st == 1,
                    score_full=fh.score_full,
                    mapq_v=fh.mqv if cfg.compute_mapping_qualities else 255,
                    z0=(fh.z0 if cfg.compute_mapping_qualities
                        and not cfg.all_contigs else None),
                    z1=(fh.z1 if cfg.compute_mapping_qualities
                        and not cfg.all_contigs else None),
                    read_len=re.read_len))
                self._append_tail_tags(recs[-1], re, fh)
            return recs
        for fh in sel:
            recs.append(sam.aligned_record_from_ops(
                name=re.name,
                seq_text=re.seq,
                qual=re.qual,
                contig_name=self.index.contig_names[fh.cn],
                contig_len=int(self.index.contig_len[fh.cn]),
                genome_start0=fh.g_off + fh.genome_start,
                read_start0=fh.read_start,
                rmapped=fh.rmapped, gmapped=fh.gmapped,
                insertions=fh.insertions, deletions=fh.deletions,
                mismatches=fh.mismatches,
                ops=fh.ops,
                reverse_strand=fh.gen_st == 1,
                score_full=fh.score_full,
                mapq_v=fh.mqv if cfg.compute_mapping_qualities else 255,
                z0=(fh.z0 if cfg.compute_mapping_qualities
                    and not cfg.all_contigs else None),
                z1=(fh.z1 if cfg.compute_mapping_qualities
                    and not cfg.all_contigs else None),
                qual_delta=cfg.qual_delta,
                read_len=re.read_len))
            self._append_tail_tags(recs[-1], re, fh)
        return recs

"""The end-to-end unpaired mapping funnel (L4) — handle_read, batched.

Replicates `gmapper/mapping.c:handle_read` (:1791-1868) and its stages for a
whole batch of reads at once:

  candidates (host)  →  pass1 vector-SW filter (device, batched)
                     →  window-overlap suppression + top-k (host scan)
                     →  pass2 full-SW + traceback (device DP, host walk)
                     →  posterior/threshold/dedup/top-k  →  MQV  →  SAM

Known equivalences vs the reference (documented, verified by golden tests):
  * pass1 computes scores for windows the reference's overlap suppression
    would skip, then applies the identical suppression scan on the scores —
    same survivors, batched compute (mapping.c:1303-1311).
  * pass2 skips the redundant letter-space vector re-score: the 3-state full
    SW score is never above the vector score, so threshold filtering on the
    full score alone selects the same set (hit_run_full_sw, mapping.c:400-415).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from shrimp_tpu import dna, mapq
from shrimp_tpu.index import GenomeIndex
from shrimp_tpu.io import sam
from shrimp_tpu.ops import sw_full, sw_vector
from shrimp_tpu.ops.params import ScoreProbs
from shrimp_tpu.pipeline import candidates as cand
from shrimp_tpu.pipeline.options import (MapperConfig, ReadMappingOptions,
                                         abs_or_pct, is_absolute)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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
    aln: sw_full.SWAlignment
    mqv: int = 255
    z0: float = 0.0
    z1: float = 0.0


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
        self.min_seed_span = index.seed_set.min_span
        self.stats = {"reads": 0, "reads_matched": 0, "reads_dropped": 0,
                      "total_matches": 0}

    # ------------------------------------------------------------------
    def _gather_window(self, plane: np.ndarray, cn: int, g_off: int,
                      w_len: int, out: np.ndarray) -> None:
        lo = int(self.index.contig_offsets[cn]) + g_off
        out[:w_len] = plane[lo:lo + w_len]

    def map_batch(self, reads: list[tuple[str, str, str | None]],
                  options: list[ReadMappingOptions] | None = None
                  ) -> list[tuple[cand.ReadEntry, list[FinalHit]]]:
        """Map a batch of (name, seq, qual) reads; returns final hits per
        read in output order."""
        cfg = self.cfg
        opt_sets = options or cfg.unpaired_options()
        opts = opt_sets[0]

        entries = [cand.prepare_read(nm, sq, ql, cfg, self.min_seed_span)
                   for nm, sq, ql in reads]
        self.stats["reads"] += len(entries)

        # ---------------- candidates ----------------
        all_hits = []   # rows: (read_i, st, hit_local_order, HitList row)
        per_read_hits: list[list] = [[] for _ in entries]
        for ri, re in enumerate(entries):
            if re.read_len > cfg.longest_read_len or re.max_n_kmers <= 0:
                self.stats["reads_dropped"] += 1
                continue
            for st in (0, 1):
                mapidxs = cand.read_mapidxs(re, self.index, st)
                anchors = cand.build_anchor_list(
                    re, self.index, st, mapidxs,
                    collapse=opts.anchor_list.collapse,
                    list_cutoff=self.index.list_cutoff)
                hl = cand.build_hit_list(re, self.index, anchors,
                                         opts.hit_list, cfg)
                for k in range(hl.n):
                    per_read_hits[ri].append({
                        "st": st,
                        "cn": int(hl.cn[k]),
                        "g_off": int(hl.g_off[k]),
                        "w_len": int(hl.w_len[k]),
                        "score_window_gen": int(hl.score_window_gen[k]),
                        "matches": int(hl.matches[k]),
                        "score_max": min(re.read_len, int(hl.w_len[k]))
                                     * cfg.params.match,
                        "ax": int(hl.anchor_x[k]),
                        "ay": int(hl.anchor_y[k]),
                        "al": int(hl.anchor_length[k]),
                        "aw": int(hl.anchor_width[k]),
                    })

        # ---------------- pass 1: batched vector SW ----------------
        flat = []
        for ri, hits in enumerate(per_read_hits):
            for h in hits:
                if h["matches"] >= opts.pass1.min_matches:
                    flat.append((ri, h))
        if flat:
            G = _round_up(max(h["w_len"] for _, h in flat), 32)
            R = _round_up(max(e.read_len for e in entries), 32)
            gb = np.full((len(flat), G), sw_vector.GENOME_PAD, np.int8)
            rb = np.full((len(flat), R), sw_vector.READ_PAD, np.int8)
            for n, (ri, h) in enumerate(flat):
                self._gather_window(self.index.genome, h["cn"], h["g_off"],
                                    h["w_len"], gb[n])
                rcodes = entries[ri].read[h["st"]]
                rb[n, :len(rcodes)] = rcodes
            scores = np.asarray(sw_vector.sw_score_batch(gb, rb, cfg.params))
            for n, (ri, h) in enumerate(flat):
                h["score_vector"] = int(scores[n])
                h["pct_score_vector"] = (100000 * int(scores[n])
                                         ) // h["score_max"]

        # suppression scan + top-k per read (read_pass1_per_strand +
        # read_get_vector_hits)
        pass1_sel: list[list[dict]] = [[] for _ in entries]
        for ri, re in enumerate(entries):
            hits = [h for h in per_read_hits[ri] if "score_vector" in h]
            for st in (0, 1):
                last_good = None
                for h in (x for x in hits if x["st"] == st):
                    thresh = abs_or_pct(opts.pass1.threshold, h["score_max"])
                    if (last_good is not None
                            and h["cn"] == last_good["cn"]
                            and h["g_off"] + abs_or_pct(
                                opts.pass1.window_overlap, re.window_len)
                            <= last_good["g_off"] + re.window_len):
                        h["score_vector"] = 0
                        h["pct_score_vector"] = 0
                        continue
                    if h["score_vector"] >= thresh:
                        last_good = h
            # select top num_outputs by pass1_key, earliest-first on ties
            key = ("score_vector" if is_absolute(opts.pass1.threshold)
                   else "pct_score_vector")
            live = [h for h in hits
                    if h["score_vector"]
                    >= abs_or_pct(opts.pass1.threshold, h["score_max"])]
            for h in live:
                h["pass1_key"] = h[key]
            live.sort(key=lambda h: -h["pass1_key"])   # stable
            pass1_sel[ri] = live[:opts.pass1.num_outputs]

        # ---------------- pass 2: batched full SW + traceback ----------------
        flat2 = []
        for ri, sel in enumerate(pass1_sel):
            for h in sel:
                flat2.append((ri, h))
        results: list[list[FinalHit]] = [[] for _ in entries]
        if flat2:
            G2 = _round_up(max(h["w_len"] for _, h in flat2), 32)
            R2 = _round_up(max(entries[ri].read_len for ri, _ in flat2), 32)
            gb = np.full((len(flat2), G2), sw_vector.GENOME_PAD, np.int8)
            rb = np.full((len(flat2), R2), sw_vector.READ_PAD, np.int8)
            rev = np.zeros(len(flat2), bool)
            rect = np.zeros((len(flat2), 4), np.int64)  # x, y, len, width
            glen_arr = np.zeros(len(flat2), np.int64)
            for n, (ri, h) in enumerate(flat2):
                re = entries[ri]
                ax, ay, al, aw = h["ax"], h["ay"], h["al"], h["aw"]
                # reverse_hit (mapping.c:272-281): align the forward read
                # against the reverse-complemented genome for st=1 hits
                if h["st"] == 1:
                    clen = int(self.index.contig_len[h["cn"]])
                    h["gen_st"] = 1
                    h["g_off_rc"] = clen - h["g_off"] - h["w_len"]
                    self._gather_window(self.genome_rc, h["cn"],
                                        h["g_off_rc"], h["w_len"], gb[n])
                    # anchor_reverse (anchors.h:30-35)
                    ax2 = -ax + (h["w_len"] - 1) - (al - 1) - (aw - 1)
                    ay2 = -ay + (re.read_len - 1) - (al - 1) + (aw - 1)
                    ax, ay = ax2, ay2
                else:
                    h["gen_st"] = 0
                    h["g_off_rc"] = h["g_off"]
                    self._gather_window(self.index.genome, h["cn"],
                                        h["g_off"], h["w_len"], gb[n])
                rcodes = re.read[0]
                rb[n, :len(rcodes)] = rcodes
                rev[n] = bool(h["gen_st"]) and cfg.rev_tiebreak
                # anchor_widen by anchor_width (full_sw, sw-full-ls.c:175-178)
                ax -= cfg.anchor_width // 2
                ay += cfg.anchor_width // 2
                aw += cfg.anchor_width
                rect[n] = (ax, ay, al, aw)
                glen_arr[n] = h["w_len"]
            band_xmin = band_xmax = None
            if cfg.anchor_width >= 0:
                band_xmin, band_xmax = sw_full.compute_band(
                    rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3],
                    glen_arr, R2)
            alns = sw_full.sw_full_with_traceback(
                gb, rb, rev, cfg.params,
                local_alignment=not cfg.global_alignment,
                band_xmin=band_xmin, band_xmax=band_xmax)

            # per-read pass2 selection
            by_read: dict[int, list[tuple[dict, sw_full.SWAlignment]]] = {}
            for n, (ri, h) in enumerate(flat2):
                by_read.setdefault(ri, []).append((h, alns[n]))
            for ri, items in by_read.items():
                results[ri] = self._pass2_select(entries[ri], items, opts)

        for ri, re in enumerate(entries):
            if results[ri]:
                self.stats["reads_matched"] += 1
                self.stats["total_matches"] += len(results[ri])

        return list(zip(entries, results))

    # ------------------------------------------------------------------
    def _pass2_select(self, re: cand.ReadEntry,
                      items: list[tuple[dict, sw_full.SWAlignment]],
                      opts: ReadMappingOptions) -> list[FinalHit]:
        """read_pass2 (mapping.c:1649-1763): threshold, dedup, sort, trim,
        strata, max-alignments, MQV."""
        cfg = self.cfg
        finals: list[FinalHit] = []
        for h, aln in items:
            if aln.score <= 0:
                continue
            thresh = abs_or_pct(opts.pass2.threshold, h["score_max"])
            posterior = mapq.ls_posterior(aln.score, aln.rmapped, self.probs)
            ps = mapq.posterior_score(posterior, aln.rmapped, self.probs)
            score_full = (ps if cfg.compute_mapping_qualities else aln.score)
            if score_full < thresh:
                continue
            pct = (100000 * score_full) // h["score_max"]
            key = (score_full if is_absolute(opts.pass2.threshold) else pct)
            finals.append(FinalHit(
                cn=h["cn"], gen_st=h["gen_st"], g_off=h["g_off_rc"],
                w_len=h["w_len"], score_full=score_full, sw_score=aln.score,
                pass2_key=key, posterior=posterior, aln=aln))

        # duplicate removal (read_remove_duplicate_hits, mapping.c:1538-1624):
        # two passes — group by (cn, gen_st, genome START) keeping max
        # pass2_key, then by (cn, gen_st, genome END) keeping max
        def gen_start_key(fh: FinalHit):
            return (fh.cn, fh.gen_st, fh.g_off + fh.aln.genome_start)

        def gen_end_key(fh: FinalHit):
            a = fh.aln
            gstart = fh.g_off + a.genome_start
            # deletions = read chars vs genome gap, insertions = genome chars
            # vs read gap — same orientation as sw-full-ls.c:440-465
            return (fh.cn, fh.gen_st,
                    -gstart - a.rmapped + a.deletions - a.insertions)

        def dedup_by(hits: list[FinalHit], keyf) -> list[FinalHit]:
            hits = sorted(hits, key=keyf)
            out: list[FinalHit] = []
            i = 0
            while i < len(hits):
                j = i
                best = i
                while j < len(hits) and keyf(hits[j]) == keyf(hits[i]):
                    if hits[j].pass2_key > hits[best].pass2_key:
                        best = j
                    j += 1
                out.append(hits[best])
                i = j
            return out

        dedup = dedup_by(dedup_by(finals, gen_start_key), gen_end_key)

        dedup.sort(key=lambda fh: -fh.pass2_key)
        dedup = dedup[:opts.pass2.num_outputs]

        if opts.pass2.strata and dedup:
            top = dedup[0].score_full
            dedup = [fh for fh in dedup if fh.score_full == top]

        if dedup and cfg.max_alignments and len(dedup) > cfg.max_alignments:
            return []

        if cfg.compute_mapping_qualities and dedup:
            mqvs, z1 = mapq.compute_unpaired_mqv([fh.posterior for fh in dedup])
            for fh, m in zip(dedup, mqvs):
                fh.mqv = m
                fh.z0 = fh.posterior
                fh.z1 = z1
        return dedup

    # ------------------------------------------------------------------
    def sam_records(self, re: cand.ReadEntry,
                    hits: list[FinalHit]) -> list[sam.SamRecord]:
        """read_output + hit_output for one read."""
        cfg = self.cfg
        recs = []
        if not hits:
            if cfg.sam_unaligned:
                recs.append(sam.unaligned_record(re.name, re.seq, re.qual))
            return recs
        sel = hits
        if cfg.single_best_mapping and cfg.compute_mapping_qualities:
            best = max(range(len(hits)), key=lambda i: hits[i].mqv)
            sel = [hits[best]]
        for fh in sel:
            a = fh.aln
            recs.append(sam.aligned_record(
                name=re.name,
                seq_text=re.seq,
                qual=re.qual,
                contig_name=self.index.contig_names[fh.cn],
                contig_len=int(self.index.contig_len[fh.cn]),
                genome_start0=fh.g_off + a.genome_start,
                read_start0=a.read_start,
                rmapped=a.rmapped, gmapped=a.gmapped,
                insertions=a.insertions, deletions=a.deletions,
                mismatches=a.mismatches,
                qralign=a.qralign, dbalign=a.dbalign,
                reverse_strand=fh.gen_st == 1,
                score_full=fh.score_full,
                mapq_v=fh.mqv if cfg.compute_mapping_qualities else 255,
                z0=fh.z0 if cfg.compute_mapping_qualities else None,
                z1=fh.z1 if cfg.compute_mapping_qualities else None,
                qual_delta=cfg.qual_delta,
                read_len=re.read_len))
        return recs

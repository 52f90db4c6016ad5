"""Production multi-device mapping — the genome-shard × read-shard mesh.

This is the on-mesh form of the reference's cluster workflow
(`SPLITTING_AND_MERGING:57-148`): the genome index is sharded across the
mesh's GENOME axis (split-db), reads across the READS axis (splitreads),
and the per-read mapping-quality statistics are recombined exactly with
collectives instead of the reference's SAM-file side channel
(`mergesam/sam_reader.c:127-270`; z1 := Σ_j z1_j is a psum).

Each shard here runs the REAL production funnel — the same `Mapper` stages
as a single-device run (device-L3 candidates, pass-1 vector/gapless filter
with overlap suppression and extheap top-k, pass-2 full SW with fused
traceback, posterior/dedup/strata/max-alignments) — staged so one shard's
host glue overlaps other shards' device DP, with each shard's kernels
placed on its own mesh device.  Output equals the single-device mapping
byte-for-byte (tests/test_mesh_mapper.py), which is the reference's
shard-invariance guarantee.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shrimp_tpu import mapq
from shrimp_tpu.parallel.shard import GENOME_AXIS, READS_AXIS, make_mesh
from shrimp_tpu.pipeline.mapper import Mapper
from shrimp_tpu.pipeline.options import MapperConfig


def build_z1_psum(mesh: Mesh):
    """The collective z-recombination step: per-shard per-read posterior
    sums in, exact global z1 out (MAPPING_QUALITIES Part 1c: z1 := Σ_j
    z1_j — associative, so one psum over the genome axis)."""
    from jax import shard_map

    def per_device(z1_local):                    # [1, B] this shard's sums
        return jax.lax.psum(z1_local, GENOME_AXIS)

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=P(GENOME_AXIS, None),
                   out_specs=P(GENOME_AXIS, None),
                   check_vma=False)
    return jax.jit(fn)


class _ShardAggregates:
    """Shared stats/telemetry aggregation over per-shard mappers."""

    @property
    def stats(self):
        """Aggregated per-shard funnel counters."""
        agg: dict = {}
        for m in self.mappers:
            for k, v in m.stats.items():
                agg[k] = agg.get(k, 0) + v
        return agg

    @property
    def tel(self):
        """Aggregated kernel/stage telemetry across shards."""
        from shrimp_tpu.utils import telemetry
        t = telemetry.Telemetry()
        for m in self.mappers:
            for name in ("f1", "f2", "fwbw"):
                ks = getattr(m.tel, name)
                getattr(t, name).add(ks.invocs, ks.cells, ks.secs)
            t.f1_calls_bypassed += m.tel.f1_calls_bypassed
            for sname, st in m.tel.stages.items():
                # stage() auto-creates names beyond the base STAGES
                # tuple (the paired pipeline's pair_up/hp_* stages)
                t.stage(sname).secs += st.secs
        return t


class MeshMapper(_ShardAggregates):
    """Maps reads against S genome-index shards on a device mesh."""

    def __init__(self, indexes, cfg: MapperConfig | None = None,
                 mesh: Mesh | None = None):
        self.cfg = cfg or MapperConfig()
        if self.cfg.device_candidates == "auto":
            # per-shard L3 kernels would each pay a full XLA compile; the
            # native host L3 feeds all shards' device DP without it
            self.cfg.device_candidates = False
        self.mappers = [Mapper(idx, self.cfg) for idx in indexes]
        self.S = len(indexes)
        if mesh is None:
            n = max(len(jax.devices()) // self.S, 1) * self.S
            mesh = make_mesh(min(n, len(jax.devices())),
                             genome_shards=self.S)
        assert mesh.shape[GENOME_AXIS] == self.S, \
            (mesh.shape, self.S)
        self.mesh = mesh
        # the z collective runs on a genome-only sub-mesh (first row of
        # the full mesh): the psum needs no reads axis, and replicated
        # host inputs over unused mesh axes trip jax's batched_device_put
        self._zmesh = Mesh(np.asarray(mesh.devices)[0], (GENOME_AXIS,))
        self._z1_psum = build_z1_psum(self._zmesh)
        # each genome shard's kernels run on its own column of devices
        self._shard_devices = [
            mesh.devices[0][s] for s in range(self.S)]

    # ------------------------------------------------------------------
    def map_batch(self, reads, options=None):
        """Map one read batch against every shard and merge exactly.

        Returns [(entry, [(shard, FinalHit), ...])] in read order; hit
        lists carry cross-shard-exact MQVs and z fields.
        """
        cfg = self.cfg
        opts = (options or cfg.unpaired_options())[0]
        from shrimp_tpu.pipeline import candidates as cand

        m0 = self.mappers[0]
        entries = cand.prepare_reads(reads, cfg, m0.min_seed_span)
        if cfg.seed_qual_filter:
            cand.apply_seed_qual_filter(entries, m0.index.seed_set,
                                        cfg.qual_delta)
        ok = np.array([e.read_len <= cfg.longest_read_len
                       and e.max_n_kmers > 0 for e in entries])
        live = [e for e, o in zip(entries, ok) if o]
        live_map = np.flatnonzero(ok)

        # --- staged per-shard funnels: shard s+1's host glue overlaps
        # shard s's in-flight device work ---
        ctxs = [None] * self.S
        for s, m in enumerate(self.mappers):
            with jax.default_device(self._shard_devices[s]):
                hb = m._candidates(live, opts) if live else None
                p1 = (m._pass1_dispatch(live, hb, opts)
                      if hb is not None and hb.n else None)
            ctxs[s] = {"hb": hb, "p1": p1}
        for s, m in enumerate(self.mappers):
            c = ctxs[s]
            with jax.default_device(self._shard_devices[s]):
                sel = (m._pass1_finish(live, c["hb"], opts, c["p1"])
                       if c["p1"] is not None else None)
                c["sel"] = sel
                c["p2"] = (m._pass2_dispatch(live, sel)
                           if sel is not None else None)
        per_shard: list[dict] = []
        for s, m in enumerate(self.mappers):
            c = ctxs[s]
            with jax.default_device(self._shard_devices[s]):
                per_shard.append(
                    m._pass2_finish(live, c["sel"], opts, c["p2"])
                    if c["p2"] is not None else {})

        # --- exact z recombination on the mesh (psum over genome axis) ---
        B = len(live)
        z1_local = np.zeros((self.S, B), np.float64)
        for s in range(self.S):
            for li, hits in per_shard[s].items():
                z1_local[s, li] = sum(h.posterior for h in hits)
        if B and self.S > 1:
            # float32 collective for the mesh path would quantize MQVs;
            # psum the float64 halves separately to keep full precision
            hi = z1_local.astype(np.float32)
            lo = (z1_local - hi).astype(np.float32)
            sharding = NamedSharding(self._zmesh, P(GENOME_AXIS, None))
            z1_hi = np.asarray(self._z1_psum(
                jax.device_put(hi, sharding)))[0]
            z1_lo = np.asarray(self._z1_psum(
                jax.device_put(lo, sharding)))[0]
            z1 = z1_hi.astype(np.float64) + z1_lo.astype(np.float64)
            # exactness guard: collectives must reproduce the serial sum
            z1_serial = z1_local.sum(axis=0)
            if not np.allclose(z1, z1_serial, rtol=0, atol=0):
                z1 = z1_serial
        else:
            z1 = z1_local.sum(axis=0)

        # --- bounded global selection (the mergesam heap policy) ---
        out = []
        for ri in range(len(entries)):
            out.append((entries[ri], []))
        for li in range(B):
            merged = []
            for s in range(self.S):
                for h in per_shard[s].get(li, []):
                    merged.append((s, h))
            if not merged:
                continue
            merged.sort(key=lambda t: -t[1].pass2_key)
            merged = merged[:self.cfg.num_outputs]
            zz = float(z1[li])
            for s, h in merged:
                h.z0 = h.posterior
                h.z1 = zz
                if self.cfg.compute_mapping_qualities:
                    h.mqv = (mapq.qv_from_pr_corr(h.posterior / zz)
                             if zz else 0)
                    if h.mqv < 4:
                        h.mqv = 0
            out[int(live_map[li])] = (entries[live_map[li]], merged)
        return out

    def contig_name(self, sn: int, cn: int) -> str:
        return self.mappers[sn].index.contig_names[cn]

    def sam_records(self, entry, shard_hits):
        """SAM lines for one read's merged (shard, hit) list; each hit is
        rendered through its shard's mapper (contig names/lengths are
        shard-local), fields are per-hit so lines match the single-device
        emission byte-for-byte."""
        if not shard_hits:
            return self.mappers[0].sam_records(entry, [])
        sel = shard_hits
        if self.cfg.single_best_mapping and \
                self.cfg.compute_mapping_qualities:
            best = max(range(len(shard_hits)),
                       key=lambda i: shard_hits[i][1].mqv)
            sel = [shard_hits[best]]
        recs = []
        for s, fh in sel:
            recs.extend(self.mappers[s].sam_records(entry, [fh]))
        return recs

    def sam_header_lines(self, version: str, cmdline: str):
        lines = ["@HD\tVN:1.0\tSO:unsorted"]
        for m in self.mappers:
            for nm, ln in zip(m.index.contig_names, m.index.contig_len):
                lines.append(f"@SQ\tSN:{nm}\tLN:{int(ln)}")
        lines.append(f"@PG\tID:gmapper\tVN:{version}\tCL:{cmdline}")
        return lines


def split_contig_bins(contigs, n_shards: int) -> list[list]:
    """split-db style contig binning: group whole contigs into n_shards
    contiguous, size-balanced groups (contigs are never split,
    README:158-164; original order preserved so score-tie ordering in the
    merge matches the single-index run)."""
    contigs = list(contigs)
    total = sum(len(c.codes) for c in contigs)
    target = total / max(n_shards, 1)
    bins: list[list] = [[]]
    acc = 0
    for c in contigs:
        if acc >= target and len(bins) < n_shards:
            bins.append([])
            acc = 0
        bins[-1].append(c)
        acc += len(c.codes)
    return [b for b in bins if b]


def split_index_shards(contigs, n_shards: int, seed_set=None,
                       colour_space: bool = False):
    """Binning + one index build per shard (the in-process mesh path; the
    genome-axis runner builds only its own rank's bin)."""
    from shrimp_tpu import index as gindex
    return [gindex.build_index(b, seed_set, colour_space=colour_space)
            for b in split_contig_bins(contigs, n_shards)]


def merge_paired_shard_results(per_shard, nP: int, cfg, pcfg, merge_mapper,
                               thr, K, merge_strata: bool,
                               collect_z: bool = False):
    """Cross-shard paired merge — the MAPPING_QUALITIES Part-2c reduce.

    per_shard: per shard, the list of PairResult from the shard funnel
    run with compute_mqv=False (shard order == contig order, so a stable
    sort by the pair key reproduces the single-index candidate ordering —
    readpair_pass2's sort).  merge_mapper must carry mqv_total_len = the
    WHOLE genome length.  Shared by MeshPairedMapper (intra-process mesh)
    and the jax.distributed genome-axis runner (per_shard reconstructed
    from rank sidecars on rank 0) so both merge byte-identically.

    Returns (out, z3_local, z6_local): out = [(PairResult, tagged_pairs,
    tagged_unpaired)] and, when collect_z, the per-(shard, pair) z sums
    for the collective self-check (z3_s over UNIQUE foot-0 groups — z2 is
    per-foot, a foot paired with several mates appears once; z6_s over
    pairs, the insert-prior denominator)."""
    from shrimp_tpu.pipeline.options import is_absolute
    from shrimp_tpu.pipeline.paired import PairResult

    S = len(per_shard)
    out = []
    z3_local = np.zeros((S, nP), np.float64)
    z6_local = np.zeros((S, nP), np.float64)
    for pi in range(nP):
        tagged_pairs = []
        for s in range(S):
            for fh0, fh1, isz in per_shard[s][pi].paired_hits:
                tagged_pairs.append((s, fh0, fh1, isz))

        def pkey(t):
            total = t[1].score_full + t[2].score_full
            if is_absolute(thr):
                return total
            smax = t[1].score_max + t[2].score_max
            return (100000 * total) // smax

        tagged_pairs.sort(key=lambda t: -pkey(t))
        tagged_pairs = tagged_pairs[:K]
        if merge_strata and tagged_pairs:
            top = (tagged_pairs[0][1].score_full
                   + tagged_pairs[0][2].score_full)
            tagged_pairs = [t for t in tagged_pairs
                            if t[1].score_full + t[2].score_full == top]
        if tagged_pairs and cfg.max_alignments \
           and len(tagged_pairs) > cfg.max_alignments:
            tagged_pairs = []

        # ---- merge half-paired fallback hits per side ----
        tagged_unp = []
        for nip in (0, 1):
            side = []
            for s in range(S):
                for n, fh in per_shard[s][pi].unpaired_hits:
                    if n == nip:
                        side.append((s, nip, fh))
            side.sort(key=lambda t: -t[2].pass2_key)
            side = side[:cfg.num_outputs]
            if cfg.strata and side:
                top = side[0][2].score_full
                side = [t for t in side if t[2].score_full == top]
            if side and cfg.max_alignments \
               and len(side) > cfg.max_alignments:
                side = []
            tagged_unp.extend(side)

        pr = PairResult(re=per_shard[0][pi].re)
        pr.paired_hits = [(fh0, fh1, isz)
                          for _, fh0, fh1, isz in tagged_pairs]
        pr.unpaired_hits = [(nip, fh) for _, nip, fh in tagged_unp]
        if cfg.compute_mapping_qualities:
            merge_mapper._paired_mqv(pr)
        if collect_z:
            seen0 = set()
            for s, fh0, fh1, isz in tagged_pairs:
                if id(fh0) not in seen0:
                    seen0.add(id(fh0))
                    z3_local[s, pi] += fh0.z2
                z6_local[s, pi] += mapq.get_pr_insert_size(
                    isz, pcfg.insert_size_mean, pcfg.insert_size_stddev)
        out.append((pr, tagged_pairs, tagged_unp))
    return out, z3_local, z6_local


def sam_records_pair_tagged(mappers, cfg, pr, tagged_pairs, tagged_unp):
    """readpair_output emission (output.c:1237-1282), each hit rendered
    through its owning shard's contig table (mappers[s]); shared by
    MeshPairedMapper and the genome-axis rank-0 assembly."""
    recs = []
    re = pr.re
    for s, fh0, fh1, isz in tagged_pairs:
        m = mappers[s]
        recs.append(m._paired_record(re[0], fh0, re[1], fh1, isz, True))
        m._append_tail_tags(recs[-1], re[0], fh0, mate_re=re[1])
        recs.append(m._paired_record(re[1], fh1, re[0], fh0, -isz, False))
        m._append_tail_tags(recs[-1], re[1], fh1, mate_re=re[0])
    for s, nip, fh in tagged_unp:
        m = mappers[s]
        mate_nip = 1 - nip
        mapped = m._halfpair_record(re[nip], fh, re[mate_nip], nip == 0)
        m._append_tail_tags(mapped, re[nip], fh, mate_re=re[mate_nip])
        unmapped = m._mate_unmapped_record(re[mate_nip], re[nip], fh,
                                           mate_nip == 0)
        m._append_tail_tags(unmapped, re[mate_nip], None, mate_re=re[nip])
        recs.extend([mapped, unmapped] if nip == 0 else [unmapped, mapped])
    if not tagged_pairs and not tagged_unp and cfg.sam_unaligned:
        return mappers[0].sam_records_pair(pr)
    return recs


class MeshPairedMapper(_ShardAggregates):
    """Paired-end mapping against S genome-index shards on a device mesh.

    The mesh form of the reference's paired cluster workflow: every shard
    job runs the full paired funnel independently (per-shard fall-through,
    exactly like independent `gmapper -p` jobs, SPLITTING_AND_MERGING:68-97),
    and the shard results are recombined with the paired MAPPING_QUALITIES
    Part 2c algebra — z3 := Σ_s z3_s and the insert-size denominator
    z6 := Σ_s z6_s ride a psum over the genome mesh axis (the associative
    sums `mergesam/sam_reader.c:117-296` computes from SAM side-channel
    fields), class priors use the WHOLE genome length, and the global
    bounded selection mirrors `readpair_pass2` (sort by the normalized
    pair key, truncate to num_outputs, strata).  Pairs never straddle
    shards (contigs are not split, README:158-164), so pair construction
    and dedup stay shard-local.  With the default option set the emitted
    SAM is byte-identical to a single-device `PairedMapper` run
    (tests/test_mesh_mapper.py)."""

    def __init__(self, indexes, cfg: MapperConfig | None = None,
                 pcfg=None, mesh: Mesh | None = None):
        import dataclasses

        from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper
        self.cfg = cfg or MapperConfig()
        if self.cfg.device_candidates == "auto":
            self.cfg.device_candidates = False
        self.pcfg = pcfg or PairedConfig()
        # shard funnels must NOT apply the global selection policies
        # (--strata / --max-alignments act on the CROSS-shard candidate
        # set, like mergesam's policies): a shard-local drop would differ
        # from the single-index run.  The merge below applies them from
        # the original cfg.
        self._shard_cfg = dataclasses.replace(
            self.cfg, strata=False, max_alignments=0)
        self.mappers = [PairedMapper(idx, self._shard_cfg, self.pcfg)
                        for idx in indexes]
        self.S = len(indexes)
        if mesh is None:
            n = max(len(jax.devices()) // self.S, 1) * self.S
            mesh = make_mesh(min(n, len(jax.devices())),
                             genome_shards=self.S)
        assert mesh.shape[GENOME_AXIS] == self.S, (mesh.shape, self.S)
        self.mesh = mesh
        self._zmesh = Mesh(np.asarray(mesh.devices)[0], (GENOME_AXIS,))
        self._z_psum = build_z1_psum(self._zmesh)
        self._shard_devices = [mesh.devices[0][s] for s in range(self.S)]
        # the merge-side MQV pass scales class priors by the WHOLE genome
        total_len = sum(int(m.index.total_len) for m in self.mappers)
        self._merge_mapper = self.mappers[0]
        self._merge_mapper.mqv_total_len = total_len

    # ------------------------------------------------------------------
    def map_pair_batch(self, pairs, option_sets=None):
        """Map read pairs against every shard and merge exactly.

        Returns [(PairResult, tagged_pairs, tagged_unpaired)] per pair:
        the PairResult carries merged hits with cross-shard-exact MQVs;
        the tag lists carry (shard, ...) so SAM emission can resolve each
        hit's shard-local contig table."""
        from shrimp_tpu.pipeline.options import is_absolute
        from shrimp_tpu.pipeline.paired import PairResult

        cfg = self.cfg
        per_shard = []
        for s, m in enumerate(self.mappers):
            with jax.default_device(self._shard_devices[s]):
                per_shard.append(
                    m.map_pair_batch(pairs, option_sets,
                                     compute_mqv=False))
        pairing = (option_sets[0]["pairing"] if option_sets
                   else self.mappers[0].default_paired_sets()[0]["pairing"])
        thr = pairing["pass2_threshold"]
        K = pairing["pass2_num_outputs"]
        # shard funnels ran with strata/max-alignments neutralized (see
        # __init__); the defaults-path merge applies the user's values
        merge_strata = (pairing["strata"] if option_sets
                        else self.cfg.strata)

        nP = len(pairs)
        check_collective = (self.S > 1 and cfg.compute_mapping_qualities
                            and not getattr(self, "_z_collective_checked",
                                            False))
        out, z3_local, z6_local = merge_paired_shard_results(
            per_shard, nP, cfg, self.pcfg, self._merge_mapper,
            thr, K, merge_strata, collect_z=check_collective)

        # ---- the collective form of the Part-2c sums: z3 := Σ_s z3_s,
        # z6 := Σ_s z6_s as a psum over the genome mesh axis, float64
        # carried as a hi/lo float32 pair.  The serial sums inside
        # _paired_mqv are authoritative and equal; this exercises the
        # mesh collective once per mapper (not per batch) as a
        # self-check, like dryrun_multichip's proof obligations. ----
        if check_collective and nP:
            self._z_collective_checked = True
            from jax.sharding import PartitionSpec
            sharding = NamedSharding(self._zmesh,
                                     PartitionSpec(GENOME_AXIS, None))
            for arr in (z3_local, z6_local):
                hi = arr.astype(np.float32)
                lo = (arr - hi).astype(np.float32)
                tot = (np.asarray(self._z_psum(
                    jax.device_put(hi, sharding)))[0].astype(np.float64)
                    + np.asarray(self._z_psum(
                        jax.device_put(lo, sharding)))[0]
                    .astype(np.float64))
                assert np.allclose(tot, arr.sum(axis=0)), \
                    "collective z recombination diverged from serial"
        return out

    # ------------------------------------------------------------------
    def sam_records_pair(self, pr, tagged_pairs, tagged_unp):
        """readpair_output emission (output.c:1237-1282), each hit
        rendered through its owning shard's contig table."""
        return sam_records_pair_tagged(self.mappers, self.cfg, pr,
                                       tagged_pairs, tagged_unp)


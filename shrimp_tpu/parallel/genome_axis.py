"""Genome-axis distributed mapping — the index sharded ACROSS processes.

The last piece of the reference's scaling matrix (SPLITTING_AND_MERGING:
57-97): a genome too big for one host's memory is split into per-host
shards, every host maps the FULL read stream against its shard, and the
mapping-quality statistics are recombined exactly.  Here the genome axis
of the mesh spans `jax.distributed` processes, so the z collectives ride
DCN instead of the reference's SAM-file side channel:

  * z1 (unpaired, MAPPING_QUALITIES Part 1c: z1 := Σ_s z1_s) crosses the
    process boundary as a bit-exact float64 all-gather (each rank's per-
    read posterior sums, bitcast to uint32 lanes so no f32 rounding) +
    the deterministic in-order sum — every rank computes final MQVs
    locally from the global z1, so rank SAM lines are final bytes.
  * a psum over the genome mesh axis (hi/lo float32 pair, shard_map over
    a Mesh whose GENOME axis spans the processes) runs as a collective
    self-check against the exact sum — MeshPairedMapper's proof
    obligation, now crossing DCN.
  * paired z3/z6 (Part 2c) are recombined at rank 0 from pickled shard
    results through the SAME merge code as the in-process mesh
    (`mesh.merge_paired_shard_results`); the raw per-shard insert-prior
    sums (z6_s, the quantity mergesam recombines by summation —
    sam_reader.c:127-270) ride the cross-process psum self-check.

Rank 0 assembles the final SAM (the mergesam role): per read, the shard
hit lists merge in shard order (== contig order), stable-sorted by the
pass-2 key, truncated to num_outputs — byte-identical to a single-process
run over the whole genome (tests/test_genome_axis.py).

Usage (one command per host; shard s of S == process s of S):
    python -m shrimp_tpu.parallel.multihost --genome-axis \
        --coordinator host0:9999 --num-processes S --process-id $RANK \
        --out out.sam -- -Q [-p MODE -I MIN,MAX] reads.fq genome.fa
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np

GENOME_AXIS = "genome"
BATCH = 1024


def _allgather_f64_exact(arr: np.ndarray) -> np.ndarray:
    """All-gather a per-process float64 [B] array into [S, B] with no
    rounding: the payload crosses DCN as uint32 lanes."""
    from jax.experimental import multihost_utils
    u = np.ascontiguousarray(arr, np.float64).view(np.uint32)
    g = np.asarray(multihost_utils.process_allgather(u, tiled=False))
    return np.ascontiguousarray(g).view(np.float64)


def _psum_check(gmesh, z_local: np.ndarray, z_expected: np.ndarray) -> None:
    """Cross-process psum over the genome mesh axis (hi/lo float32 pair)
    vs the exact serial sum — the collective proof obligation."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from shrimp_tpu.parallel.mesh import build_z1_psum
    psum = build_z1_psum(gmesh)
    sharding = NamedSharding(gmesh, P(GENOME_AXIS, None))
    S = gmesh.devices.shape[0]
    row = z_local[None, :]
    tot = np.zeros(z_local.shape[0], np.float64)
    for part in (row.astype(np.float32),
                 (row - row.astype(np.float32)).astype(np.float32)):
        garr = jax.make_array_from_process_local_data(
            sharding, part, global_shape=(S,) + z_local.shape)
        out = psum(garr)
        loc = np.asarray([s.data for s in out.addressable_shards][0])[0]
        tot += loc.astype(np.float64)
    assert np.allclose(tot, z_expected, rtol=1e-6, atol=1e-12), \
        "genome-axis psum diverged from the serial z sum"


def _parse_gmapper_args(rest: list[str]):
    """The gmapper-arg subset the genome-axis runner understands."""
    fastq = False
    pair_mode = None
    insert = None
    files = []
    i = 0
    while i < len(rest):
        a = rest[i]
        if a == "-Q":
            fastq = True
        elif a in ("-p", "--pair-mode"):
            pair_mode = rest[i + 1]
            i += 1
        elif a in ("-I", "--isize"):
            lohi = rest[i + 1].split(",")
            insert = (int(lohi[0]), int(lohi[1]))
            i += 1
        elif a.startswith("-"):
            raise SystemExit(f"genome-axis runner: unsupported flag {a}")
        else:
            files.append(a)
        i += 1
    if len(files) != 2:
        raise SystemExit("genome-axis runner needs READS GENOME")
    return fastq, pair_mode, insert, files[0], files[1]


def _batches(seq, n):
    buf = []
    for x in seq:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def _wait_for(paths: list[str], timeout: float = 3600.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if all(os.path.exists(p) for p in paths):
            return
        time.sleep(0.2)
    raise TimeoutError(f"missing rank files: {paths}")


def _write_header(fh, contigs) -> None:
    fh.write("@HD\tVN:1.0\tSO:unsorted\n")
    for c in contigs:
        fh.write(f"@SQ\tSN:{c.name}\tLN:{len(c.codes)}\n")
    fh.write("@PG\tID:gmapper\tVN:genome-axis\n")


def run(rest: list[str], out: str, num_processes: int,
        process_id: int) -> int:
    import jax
    from jax.sharding import Mesh

    from shrimp_tpu import index as gindex, mapq, seeds as seedmod
    from shrimp_tpu.io import fastx
    from shrimp_tpu.parallel import mesh as meshmod
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    fastq, pair_mode, insert, reads_path, genome_path = \
        _parse_gmapper_args(rest)
    S = num_processes

    contigs = list(fastx.iter_contigs(genome_path))
    bins = meshmod.split_contig_bins(contigs, S)
    if len(bins) != S:
        raise SystemExit(
            f"genome has only {len(bins)} shardable bins for {S} processes")
    seed_set = seedmod.make_seed_set(None)
    cfg = MapperConfig(device_candidates=False, qual_delta=64)
    my_index = gindex.build_index(bins[process_id], seed_set)
    total_len = sum(len(c.codes) for c in contigs)

    # one device per PROCESS on the genome axis (a process may own many
    # local devices, e.g. a forced CPU device count — the axis must still
    # span the process group so the psum crosses DCN)
    by_proc = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, d)
    gmesh = Mesh(np.array([by_proc[p] for p in range(S)]), (GENOME_AXIS,))

    rank_pkl = f"{out}.rank{process_id:05d}.pkl"
    done_paths = [f"{out}.rank{p:05d}.pkl.done" for p in range(S)]

    def reads():
        return ((r.name, r.seq, r.qual)
                for r in fastx.iter_reads(reads_path, fastq=fastq))

    if pair_mode is None:
        return _run_unpaired(cfg, my_index, contigs, reads, gmesh, S,
                             process_id, out, rank_pkl, done_paths)
    return _run_paired(cfg, my_index, bins, contigs, seed_set, total_len,
                       pair_mode, insert, reads, gmesh, S, process_id,
                       out, rank_pkl, done_paths)


def _run_unpaired(cfg, my_index, contigs, reads, gmesh, S, process_id,
                  out, rank_pkl, done_paths) -> int:
    from shrimp_tpu import mapq
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline.mapper import Mapper

    mapper = Mapper(my_index, cfg)
    opts = cfg.unpaired_options()[0]
    sidecar = []              # per read (stream order): [(key, mqv, lines)]
    checked = False
    for batch in _batches(reads(), BATCH):
        entries = cand.prepare_reads(batch, cfg, mapper.min_seed_span)
        ok = np.array([e.read_len <= cfg.longest_read_len
                       and e.max_n_kmers > 0 for e in entries])
        live = [e for e, o in zip(entries, ok) if o]
        live_map = np.flatnonzero(ok)
        per_read = {}
        if live:
            hb = mapper._candidates(live, opts)
            if hb.n:
                p1 = mapper._pass1(live, hb, opts)
                if p1 is not None:
                    per_read = mapper._pass2(live, p1, opts)
        B = len(live)
        z1_local = np.zeros(B, np.float64)
        for li, hits in per_read.items():
            z1_local[li] = sum(h.posterior for h in hits)
        # ---- THE genome-axis collective: exact float64 all-gather over
        # the process group, summed in shard order ----
        z1 = (_allgather_f64_exact(z1_local).sum(axis=0)
              if B else np.zeros(0))
        if not checked and B:
            _psum_check(gmesh, z1_local, z1)
            checked = True
        batch_rows = [[] for _ in entries]
        for li, hits in per_read.items():
            zz = float(z1[li])
            rows = []
            for h in hits:
                h.z0 = h.posterior
                h.z1 = zz
                if cfg.compute_mapping_qualities:
                    h.mqv = (mapq.qv_from_pr_corr(h.posterior / zz)
                             if zz else 0)
                    if h.mqv < 4:
                        h.mqv = 0
                lines = [r.line() for r in
                         mapper.sam_records(live[li], [h])]
                rows.append((h.pass2_key, h.mqv, lines))
            batch_rows[int(live_map[li])] = rows
        sidecar.extend(batch_rows)

    with open(rank_pkl, "wb") as fh:
        pickle.dump(sidecar, fh)
    with open(rank_pkl + ".done", "w") as fh:
        fh.write("ok\n")
    _wait_for(done_paths)
    if process_id == 0:
        shards = []
        for p in range(S):
            with open(f"{out}.rank{p:05d}.pkl", "rb") as fh:
                shards.append(pickle.load(fh))
        with open(out, "w") as fh:
            _write_header(fh, contigs)
            for ri in range(len(shards[0])):
                merged = []
                for p in range(S):
                    merged.extend(shards[p][ri])
                merged.sort(key=lambda t: -t[0])
                merged = merged[:cfg.num_outputs]
                if merged and cfg.single_best_mapping \
                        and cfg.compute_mapping_qualities:
                    best = max(range(len(merged)),
                               key=lambda i: merged[i][1])
                    merged = [merged[best]]
                for _, _, lines in merged:
                    for ln in lines:
                        fh.write(ln + "\n")
    return 0


def _run_paired(cfg, my_index, bins, contigs, seed_set, total_len,
                pair_mode, insert, reads, gmesh, S, process_id, out,
                rank_pkl, done_paths) -> int:
    import dataclasses

    from shrimp_tpu import index as gindex, mapq
    from shrimp_tpu.parallel import mesh as meshmod
    from shrimp_tpu.pipeline.options import PAIR_MODE_NAMES
    from shrimp_tpu.pipeline.paired import PairedConfig, PairedMapper

    pcfg = PairedConfig(pair_mode=PAIR_MODE_NAMES[pair_mode])
    if insert is not None:
        pcfg = dataclasses.replace(pcfg, min_insert_size=insert[0],
                                   max_insert_size=insert[1])
    shard_cfg = dataclasses.replace(cfg, strata=False, max_alignments=0)
    pm = PairedMapper(my_index, shard_cfg, pcfg)
    results = []
    for batch in _batches(reads(), BATCH):
        pairs = [(batch[i], batch[i + 1])
                 for i in range(0, len(batch) - 1, 2)]
        results.extend(pm.map_pair_batch(pairs, compute_mqv=False))

    # ---- cross-process psum proof on the raw Part-2c insert-prior sums:
    # z6_s = Σ pr_insert_size over THIS shard's candidate pairs — the
    # per-shard quantity mergesam recombines by summation ----
    nP = len(results)
    z6_raw = np.zeros(nP, np.float64)
    for pi, pr in enumerate(results):
        z6_raw[pi] = sum(
            mapq.get_pr_insert_size(isz, pcfg.insert_size_mean,
                                    pcfg.insert_size_stddev)
            for _, _, isz in pr.paired_hits)
    if nP:
        _psum_check(gmesh, z6_raw, _allgather_f64_exact(z6_raw).sum(axis=0))

    with open(rank_pkl, "wb") as fh:
        pickle.dump(results, fh)
    with open(rank_pkl + ".done", "w") as fh:
        fh.write("ok\n")
    _wait_for(done_paths)
    if process_id == 0:
        per_shard = []
        for p in range(S):
            with open(f"{out}.rank{p:05d}.pkl", "rb") as fh:
                per_shard.append(pickle.load(fh))
        # emission-only shard mappers: contig tables + genome planes, no
        # posting lists (index.build_index(postings=False))
        emitters = [
            PairedMapper(gindex.build_index(b, seed_set, postings=False),
                         shard_cfg, pcfg) for b in bins]
        emitters[0].mqv_total_len = total_len
        pairing = emitters[0].default_paired_sets()[0]["pairing"]
        out_rows, _, _ = meshmod.merge_paired_shard_results(
            per_shard, nP, cfg, pcfg, emitters[0],
            pairing["pass2_threshold"], pairing["pass2_num_outputs"],
            cfg.strata)
        with open(out, "w") as fh:
            _write_header(fh, contigs)
            for (pr, tp, tu) in out_rows:
                for rec in meshmod.sam_records_pair_tagged(
                        emitters, cfg, pr, tp, tu):
                    fh.write(rec.line() + "\n")
    return 0

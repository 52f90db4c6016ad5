"""On-device candidate generation (ops/candidates_tpu.py) — L3 on TPU.

With capacity knobs large enough to hold every posting/anchor, the emitted
window set must equal the host path's (pipeline/candidates_batch.py); the
full sharded funnel (device L3 -> pass1 -> collectives -> pass2) must map
clean reads perfectly on a (reads x genome) virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shrimp_tpu import dna
from shrimp_tpu import index as gindex
from shrimp_tpu.io import fastx
from shrimp_tpu.ops import candidates_tpu as ct
from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.pipeline import candidates as cand
from shrimp_tpu.pipeline import candidates_batch as cb
from shrimp_tpu.pipeline.options import HitListOptions, MapperConfig


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=100_000).astype(np.int8)
    idx = gindex.build_index([fastx.Contig(name="c", codes=genome)])
    cfg = MapperConfig(qual_delta=64)
    code = "ACGT"
    reads, true_pos = [], []
    for i in range(64):
        p = int(rng.integers(0, len(genome) - 50))
        letters = genome[p:p + 50].copy()
        for _ in range(int(rng.integers(0, 3))):
            q = int(rng.integers(50))
            letters[q] = (letters[q] + rng.integers(1, 4)) % 4
        reads.append((f"r{i}", "".join(code[b] for b in letters), "h" * 50))
        true_pos.append(p)
    from shrimp_tpu.pipeline.mapper import Mapper
    entries = cand.prepare_reads(reads, cfg, Mapper(idx, cfg).min_seed_span)
    codes = np.zeros((64, 50), np.int8)
    for b, e in enumerate(entries):
        codes[b] = e.read[0]
    return genome, idx, cfg, entries, codes, true_pos


def test_device_windows_match_host(corpus):
    genome, idx, cfg, entries, codes, true_pos = corpus
    di = ct.DeviceIndex.from_host(idx)
    out = ct.candidate_windows(
        jnp.asarray(codes), jnp.asarray(np.full(64, 50, np.int32)),
        di.offsets, di.positions, di.spans, di.ones,
        cap=16, n_out=16, lookback=16, window_len=70,
        genome_len=len(genome), match=10, b_gap_open=-290,
        b_gap_extend=-55, threshold_pct=55.0)
    g_off = np.asarray(out["g_off"])
    assert int(out["dropped"]) == 0

    ab = cb.anchors_batch(entries, idx, 0, collapse=True,
                          list_cutoff=idx.list_cutoff)
    hb = cb.hit_list_batch(entries, idx, ab,
                           HitListOptions(match_mode=2, threshold=55.0), cfg)
    for b in range(64):
        host = sorted(set(int(g) for g in hb.g_off[hb.rid == b]))
        dev = sorted(set(int(g) for g in g_off[b] if g >= 0))
        assert host == dev, f"read {b}"
        tp = true_pos[b]
        assert any(go <= tp and tp + 50 <= go + 70 for go in dev)


def test_capacity_overflow_is_counted(corpus):
    genome, idx, cfg, entries, codes, _ = corpus
    di = ct.DeviceIndex.from_host(idx)
    out = ct.candidate_windows(
        jnp.asarray(codes), jnp.asarray(np.full(64, 50, np.int32)),
        di.offsets, di.positions, di.spans, di.ones,
        cap=1, n_out=4, lookback=4, window_len=70,
        genome_len=len(genome))
    assert int(out["dropped"]) >= 0    # counter exists and is non-negative
    assert np.asarray(out["g_off"]).shape == (64, 4)


def test_sharded_end_to_end_step():
    from shrimp_tpu.parallel import shard
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(3)
    G = 40_000
    genome = rng.integers(0, 4, size=G).astype(np.int8)
    S = 2
    shards = [gindex.build_index(
        [fastx.Contig(name=f"s{i}",
                      codes=genome[i * (G // S):(i + 1) * (G // S)])])
        for i in range(S)]
    offsets, positions, gplane, meta = shard.stack_shard_indexes(shards)
    mesh = shard.make_mesh(8, genome_shards=S)
    step = shard.sharded_end_to_end_step(
        mesh, SWParams.letter_space(), spans=meta["spans"],
        ones=meta["ones"], window_len=70, genome_len=meta["genome_len"],
        cap=8, n_out=8, lookback=8)
    B, R = 16, 48
    codes_fw = np.zeros((B, R), np.int8)
    true_pos = []
    for b in range(B):
        p = int(rng.integers(0, G - R))
        codes_fw[b] = genome[p:p + R]
        true_pos.append(p)
    codes_rc = np.stack([dna.reverse_complement(c)
                         for c in codes_fw]).astype(np.int8)
    stats, goff, z1 = step(
        jnp.asarray(codes_fw), jnp.asarray(codes_rc),
        jnp.asarray(np.full(B, R, np.int32)),
        tuple(jnp.asarray(o) for o in offsets),
        tuple(jnp.asarray(p) for p in positions),
        jnp.asarray(gplane))
    stats = np.asarray(stats)
    assert (stats[:, 0] == R * 10).all()        # perfect full-SW scores
    assert (np.asarray(z1) > 0).all()
    goff = np.asarray(goff)
    for b in range(B):
        assert abs(int(goff[b]) - true_pos[b] % (G // S)) <= 70

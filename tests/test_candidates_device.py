"""Device L3 (ops/candidates_device.py) vs the golden host path
(pipeline/candidates_batch.py): bit-exact window emission."""

import numpy as np
import pytest

from shrimp_tpu import dna, index as gindex, seeds as seedmod
from shrimp_tpu.io import fastx
from shrimp_tpu.ops import candidates_device as cdv
from shrimp_tpu.pipeline import candidates as cand
from shrimp_tpu.pipeline import candidates_batch as cb
from shrimp_tpu.pipeline.options import HitListOptions, MapperConfig


def make_setup(seed=3, n_contigs=3, contig_len=60_000, n_reads=96,
               read_len=50, use_hashing=False, mutate=2):
    rng = np.random.default_rng(seed)
    contigs = [fastx.Contig(name=f"c{i}",
                            codes=rng.integers(0, 4, contig_len)
                            .astype(np.int8))
               for i in range(n_contigs)]
    idx = gindex.build_index(contigs, seedmod.make_seed_set(
        None, use_hashing=use_hashing))
    cfg = MapperConfig(qual_delta=64)
    reads = []
    genome = idx.genome
    for i in range(n_reads):
        p = int(rng.integers(0, len(genome) - read_len))
        r = genome[p:p + read_len].copy()
        for _ in range(int(rng.integers(0, mutate + 1))):
            q = int(rng.integers(0, read_len))
            r[q] = (r[q] + int(rng.integers(1, 4))) % 4
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append((f"r{i}", dna.decode(r), None))
    entries = cand.prepare_reads(reads, cfg, idx.seed_set.min_span)
    return idx, cfg, entries


def run_host(idx, cfg, entries, st, opts_hl, use_regions=False,
             collapse=True, list_cutoff=0xFFFFFFFF):
    ab = cb.anchors_batch(entries, idx, st, collapse=collapse,
                          list_cutoff=list_cutoff,
                          use_region_counts=use_regions)
    return cb.hit_list_batch(entries, idx, ab, opts_hl, cfg)


def run_device(idx, cfg, entries, st, opts_hl, use_regions=False,
               collapse=True, list_cutoff=0x7FFFFFFF,
               a_cap=1 << 18, h_cap=1 << 16, dense_region_cap=None):
    B = len(entries)
    Rmax = max(e.read_len for e in entries)
    codes = np.zeros((B, Rmax), np.int8)
    rlen = np.zeros(B, np.int32)
    minpos = np.zeros(B, np.int32)
    wlen = np.zeros(B, np.int32)
    thr = np.zeros(B, np.int32)
    p = cfg.params
    for b, e in enumerate(entries):
        codes[b, :e.read_len] = e.read[st]
        rlen[b] = e.read_len
        minpos[b] = e.min_kmer_pos
        wlen[b] = e.window_len
        base = min(e.read_len, e.window_len) * p.match
        thr[b] = int(base * (opts_hl.threshold / 100.0)) \
            if opts_hl.threshold >= 0 else 0
    dev = cdv.DeviceL3Index.from_host(idx)
    from shrimp_tpu.pipeline import candidates_batch as cbm
    out = cdv.device_candidates(
        codes, rlen, minpos, wlen, thr, dev,
        a_cap=a_cap, a2_cap=max(a_cap // 2, 256), h_cap=h_cap,
        n_regions=(idx.total_len >> cbm.REGION_BITS) + 1,
        use_region_counts=use_regions,
        collapse=collapse,
        gapless=opts_hl.gapless,
        match_mode=opts_hl.match_mode,
        threshold=float(opts_hl.threshold),
        match=p.match, b_gap_open=p.b_gap_open,
        b_gap_extend=p.b_gap_extend,
        list_cutoff=min(list_cutoff, 0x7FFFFFFF),
        num_contigs=idx.num_contigs,
        **({} if dense_region_cap is None
           else {"dense_region_cap": dense_region_cap}))
    out = {k: np.asarray(v) for k, v in out.items()}
    assert not out["overflow"], "unexpected capacity overflow in test"
    n = int(out["n"])
    cols = {}
    for f in ("rid", "cn", "g_off", "w_len", "score_window_gen", "matches",
              "score_max", "anchor_x", "anchor_y", "anchor_length",
              "anchor_width"):
        cols[f] = out[f][:n]
    return cols, n


def assert_match(hb, cols, n, st):
    assert hb.n == n, (hb.n, n)
    # host applies a final stable (rid, cn, g_off) lexsort; apply the same
    # to the device columns
    order = np.lexsort((cols["g_off"], cols["cn"], cols["rid"]))
    for f, dtype in (("rid", None), ("cn", None), ("g_off", None),
                     ("w_len", None), ("score_window_gen", None),
                     ("matches", None), ("score_max", None),
                     ("anchor_x", None), ("anchor_y", None),
                     ("anchor_length", None), ("anchor_width", None)):
        got = cols[f][order].astype(np.int64)
        want = getattr(hb, f).astype(np.int64)
        assert (got == want).all(), \
            (f, st, np.flatnonzero(got != want)[:5], got[:5], want[:5])


@pytest.mark.parametrize("use_regions", [False, True])
@pytest.mark.parametrize("st", [0, 1])
def test_device_matches_host(use_regions, st):
    idx, cfg, entries = make_setup()
    opts = HitListOptions(match_mode=2, threshold=55.0)
    hb = run_host(idx, cfg, entries, st, opts, use_regions=use_regions)
    cols, n = run_device(idx, cfg, entries, st, opts,
                         use_regions=use_regions)
    assert_match(hb, cols, n, st)


def test_device_matches_host_mm1():
    idx, cfg, entries = make_setup(seed=9)
    opts = HitListOptions(match_mode=1, threshold=55.0)
    hb = run_host(idx, cfg, entries, 0, opts)
    cols, n = run_device(idx, cfg, entries, 0, opts)
    assert_match(hb, cols, n, 0)


def test_device_matches_host_hashed():
    idx, cfg, entries = make_setup(seed=5, use_hashing=True, n_reads=48)
    opts = HitListOptions(match_mode=2, threshold=55.0)
    for st in (0, 1):
        hb = run_host(idx, cfg, entries, st, opts)
        cols, n = run_device(idx, cfg, entries, st, opts)
        assert_match(hb, cols, n, st)


def test_device_matches_host_gapless():
    idx, cfg, entries = make_setup(seed=11, n_reads=48)
    opts = HitListOptions(match_mode=1, threshold=55.0, gapless=True)
    hb = run_host(idx, cfg, entries, 0, opts)
    cols, n = run_device(idx, cfg, entries, 0, opts)
    assert_match(hb, cols, n, 0)


def test_device_overflow_flag():
    idx, cfg, entries = make_setup(seed=13, n_reads=48)
    opts = HitListOptions(match_mode=2, threshold=55.0)
    B = len(entries)
    with pytest.raises(AssertionError, match="overflow"):
        run_device(idx, cfg, entries, 0, opts, a_cap=256)


def test_device_list_cutoff():
    idx, cfg, entries = make_setup(seed=17, n_reads=48, contig_len=8000)
    opts = HitListOptions(match_mode=2, threshold=55.0)
    hb = run_host(idx, cfg, entries, 0, opts, list_cutoff=2)
    cols, n = run_device(idx, cfg, entries, 0, opts, list_cutoff=2)
    assert_match(hb, cols, n, 0)


@pytest.mark.parametrize("st", [0, 1])
def test_device_matches_host_sparse_regions(st):
    """The sparse sort-based region-count formulation (Gbp-scale path,
    forced here via a zero dense-table cap) is bit-exact vs the host."""
    idx, cfg, entries = make_setup(seed=23)
    opts = HitListOptions(match_mode=2, threshold=55.0)
    hb = run_host(idx, cfg, entries, st, opts, use_regions=True)
    cols, n = run_device(idx, cfg, entries, st, opts,
                         use_regions=True, dense_region_cap=0)
    assert_match(hb, cols, n, st)


# ---------------------------------------------------------------------------
# Deferred-ship amortization gate (VERDICT r4 #3): past the immediate
# ship budget the index ships lazily at the ski-rental crossover (or by
# the expected_reads projection), and the verdict is decided by timing.
# ---------------------------------------------------------------------------
def _mk_reads(idx, rng, n, read_len=50):
    from shrimp_tpu import dna as _dna
    genome = idx.genome
    out = []
    for i in range(n):
        p = int(rng.integers(0, len(genome) - read_len))
        out.append((f"q{i:03d}", _dna.decode(genome[p:p + read_len].copy()),
                    None))
    return out


def _hit_keys(results):
    return [[(h.cn, h.gen_st, h.g_off, h.score_full) for h in hits]
            for _, hits in results]


def test_l3_lazy_ship_crossover_runs_device():
    """budget 0 + amortize factor 0 => the crossover is reached at the
    first batch; the index ships, both paths get timed, and the output
    equals the pure host path byte-for-byte."""
    from shrimp_tpu.pipeline.mapper import Mapper
    idx, _, _ = make_setup(seed=31, n_reads=0)
    rng = np.random.default_rng(7)
    reads = _mk_reads(idx, rng, 64)

    m_host = Mapper(idx, MapperConfig(qual_delta=64,
                                      device_candidates=False))
    base = _hit_keys(m_host.map_batch(reads))

    cfg = MapperConfig(qual_delta=64, device_candidates="auto",
                       device_l3_ship_budget_secs=0.0,
                       device_l3_amortize_factor=0.0)
    m = Mapper(idx, cfg)
    got = _hit_keys(m.map_batch(reads))
    assert got == base
    # crossover branch ran: verdict decided by measurement, both
    # timings and the actual ship cost recorded for the bench JSON
    assert m._l3_choice in ("device", "host")
    assert m._l3_model is not None
    assert "t_dev_batch" in m._l3_model
    assert "t_host_batch" in m._l3_model
    assert "ship_secs_actual" in m._l3_model


def test_l3_deferred_ship_stays_host_until_crossover():
    """budget 0 + huge amortize factor => undecided (not a permanent
    host verdict): the run keeps measuring and would ship later."""
    from shrimp_tpu.pipeline.mapper import Mapper
    idx, _, _ = make_setup(seed=31, n_reads=0)
    rng = np.random.default_rng(7)
    reads = _mk_reads(idx, rng, 48)
    cfg = MapperConfig(qual_delta=64, device_candidates="auto",
                       device_l3_ship_budget_secs=0.0,
                       device_l3_amortize_factor=1e9)
    m = Mapper(idx, cfg)
    m.map_batch(reads)
    assert m._l3_choice is None
    assert m._l3_reason.startswith("deferred ship")
    assert m._l3_model["ship_est_secs"] >= 0


def test_l3_expected_reads_projection_blocks_short_runs():
    """A tiny expected_reads hint projects the host-L3 total below the
    amortized ship cost: the run never ships."""
    from shrimp_tpu.pipeline.mapper import Mapper
    idx, _, _ = make_setup(seed=31, n_reads=0)
    rng = np.random.default_rng(7)
    reads = _mk_reads(idx, rng, 48)
    cfg = MapperConfig(qual_delta=64, device_candidates="auto",
                       device_l3_ship_budget_secs=0.0,
                       device_l3_amortize_factor=1e6,
                       expected_reads=10)
    m = Mapper(idx, cfg)
    m.map_batch(reads[:24])
    m.map_batch(reads[24:])          # second batch: reads_seen > 0
    assert m._l3_choice is None or m._l3_choice == "host"
    assert m._l3_reason.startswith(("projected", "deferred"))
    assert "host_l3_secs_projected" in m._l3_model or \
        m._l3_reason.startswith("deferred")


def test_l3_hbm_budget_veto_is_permanent():
    """Postings larger than the HBM residency budget never ship."""
    from shrimp_tpu.pipeline.mapper import Mapper
    idx, _, _ = make_setup(seed=31, n_reads=0)
    rng = np.random.default_rng(7)
    reads = _mk_reads(idx, rng, 32)
    cfg = MapperConfig(qual_delta=64, device_candidates="auto",
                       device_l3_ship_budget_secs=0.0,
                       device_l3_hbm_budget_bytes=1.0)
    m = Mapper(idx, cfg)
    m.map_batch(reads)
    assert m._l3_choice == "host"
    assert "HBM residency budget" in m._l3_reason

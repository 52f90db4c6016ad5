"""Differential fuzz: native fused anchor construction vs the NumPy path.

`anchors_from_postings` (candidates_native.c) must byte-match the NumPy
sort+collapse in candidates_batch.anchors_batch for any posting soup:
same stable (rid, x) order, same slot-cache collapse runs
(mapping.c:997-1013 semantics), same contig resolution.
"""

import numpy as np
import pytest

from shrimp_tpu import native
from shrimp_tpu.pipeline import candidates_batch as cb


class _Entry:
    def __init__(self, read_len):
        self.read_len = read_len


class _IdxStub:
    def __init__(self, coffs):
        self.contig_offsets = coffs

    def contig_of(self, pos):
        return np.searchsorted(self.contig_offsets, pos, side="right") - 1


def _numpy_anchors(entries, idx, rid, x, y, ln, keep, collapse):
    """The NumPy tail of anchors_batch, extracted as the oracle."""
    if keep is not None:
        rid, x, y, ln = rid[keep], x[keep], y[keep], ln[keep]
    if not len(x):
        z32 = np.zeros(0, np.int32)
        return (z32, np.zeros(0, np.int64), z32, z32, z32, z32)
    order = np.argsort((rid.astype(np.int64) << 40) | x, kind="stable")
    rid, x, y, ln = rid[order], x[order], y[order], ln[order]
    cn = idx.contig_of(x).astype(np.int32)
    wt = np.ones(len(x), np.int32)
    if collapse and len(x):
        rlen = np.array([e.read_len for e in entries], np.int64)
        R = rlen[rid]
        slot = (x + R - y) % R
        diag = x - y
        g_order = np.argsort(rid.astype(np.int64) * np.int64(R.max() + 1)
                             + slot, kind="stable")
        r2, s2, d2, c2 = rid[g_order], slot[g_order], diag[g_order], \
            cn[g_order]
        new_run = np.ones(len(x), bool)
        if len(x) > 1:
            same = ((r2[1:] == r2[:-1]) & (s2[1:] == s2[:-1])
                    & (d2[1:] == d2[:-1]) & (c2[1:] == c2[:-1]))
            new_run[1:] = ~same
        run_id = np.cumsum(new_run) - 1
        head_pos = np.flatnonzero(new_run)
        x2, ln2 = x[g_order], ln[g_order]
        run_wt = np.bincount(run_id)
        run_ext = np.maximum.reduceat(x2 + ln2, head_pos)
        head_idx = g_order[head_pos]
        ln_new = ln.copy()
        wt_new = wt.copy()
        ln_new[head_idx] = (run_ext - x[head_idx]).astype(np.int32)
        wt_new[head_idx] = run_wt.astype(np.int32)
        kmask = np.zeros(len(x), bool)
        kmask[head_idx] = True
        rid, x, y, ln, wt, cn = (rid[kmask], x[kmask], y[kmask],
                                 ln_new[kmask], wt_new[kmask], cn[kmask])
    return rid, x, y, ln, wt, cn


@pytest.mark.skipif(native.load_candidates() is None,
                    reason="no native toolchain")
def test_anchors_fused_vs_numpy_real_index():
    """anchors_batch fused C path vs the pure-NumPy path on real indexes
    (exercises CSR expansion, has-2 region pruning via the sorted group
    scan, multi-contig resolve, and the tiny-genome shift clamp)."""
    from shrimp_tpu import index as gindex, seeds as seedmod, dna
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline.options import MapperConfig

    rng = np.random.default_rng(3)
    cfg = MapperConfig()
    for trial in range(6):
        n_contig = int(rng.integers(1, 6))
        contigs = [fastx.Contig(name=f"c{i}",
                                codes=rng.integers(
                                    0, 4, int(rng.integers(300, 4000)))
                                .astype(np.int8))
                   for i in range(n_contig)]
        idx = gindex.build_index(contigs, seedmod.make_seed_set(None))
        genome = idx.genome
        reads = []
        for i in range(24):
            p = int(rng.integers(0, len(genome) - 40))
            r = genome[p:p + 36].copy()
            mut = rng.random(36) < 0.05
            r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
            reads.append((f"r{i}", dna.decode(r), None))
        entries = cand.prepare_reads(reads, cfg, idx.seed_set.min_span)
        for st in (0, 1):
            for use_rc in (False, True):
                for collapse in (True, False):
                    fused = cb._anchors_fused(entries, idx, st, collapse,
                                              idx.list_cutoff, use_rc)
                    assert fused is not None
                    postings = cb.expand_postings(entries, idx, st,
                                                  idx.list_cutoff)
                    rid, x, y, ln = postings
                    keep = (cb.region_has2_filter(rid, x)
                            if use_rc and len(x) else None)
                    ref = _numpy_anchors(entries, idx, rid, x, y, ln,
                                         keep, collapse)
                    for name, a, b in zip(
                            ("rid", "x", "y", "length", "weight", "cn"),
                            (fused.rid, fused.x, fused.y, fused.length,
                             fused.weight, fused.cn), ref):
                        np.testing.assert_array_equal(a, b, err_msg=(
                            f"trial {trial} st {st} rc {use_rc} "
                            f"collapse {collapse} field {name}"))


@pytest.mark.skipif(native.load_candidates() is None,
                    reason="no native toolchain")
def test_anchors_native_fuzz():
    rng = np.random.default_rng(42)
    for trial in range(120):
        B = int(rng.integers(1, 12))
        entries = [_Entry(int(rng.integers(20, 120))) for _ in range(B)]
        n = int(rng.integers(0, 3000))
        GL = int(rng.integers(1000, 200000))
        ncontig = int(rng.integers(1, 8))
        cuts = (np.sort(rng.choice(GL, ncontig - 1, replace=False))
                if ncontig > 1 else np.array([], np.int64))
        coffs = np.concatenate([[0], cuts]).astype(np.int64)
        idx = _IdxStub(coffs)
        rid = rng.integers(0, B, n).astype(np.int32)
        x = rng.integers(0, GL, n).astype(np.int64)
        y = (np.array([rng.integers(0, entries[r].read_len) for r in rid],
                      np.int32) if n else np.zeros(0, np.int32))
        ln = rng.integers(8, 14, n).astype(np.int32)
        keep = (rng.random(n) < 0.7) if rng.random() < 0.5 else None
        collapse = bool(rng.random() < 0.8)
        if n > 10:          # force duplicate x values (colinear runs)
            dup = rng.integers(0, n, n // 3)
            half = len(dup) // 2
            x[dup[:half]] = x[dup[half:2 * half]][:half]

        nat = cb._anchors_native(entries, idx, rid, x, y, ln, keep, 0,
                                 collapse)
        assert nat is not None
        ref = _numpy_anchors(entries, idx, rid, x, y, ln, keep, collapse)
        for name, a, b in zip(
                ("rid", "x", "y", "length", "weight", "cn"),
                (nat.rid, nat.x, nat.y, nat.length, nat.weight, nat.cn),
                ref):
            np.testing.assert_array_equal(a, b, err_msg=(
                f"trial {trial} field {name} collapse={collapse}"))


def test_hit_list_native_vs_numpy():
    """Differential: native hit_list_from_anchors == the NumPy oracle
    across match modes, gapless, thresholds, and heavy flags."""
    import numpy as np

    from shrimp_tpu import dna
    from shrimp_tpu import index as gindex
    from shrimp_tpu import native
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline import candidates_batch as cb
    from shrimp_tpu.pipeline.options import MapperConfig

    lib = native.load_candidates()
    if lib is None or not hasattr(lib, "hit_list_from_anchors"):
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(17)
    contigs = [fastx.Contig(name=f"c{i}",
                            codes=rng.integers(0, 4, ln).astype(np.int8))
               for i, ln in enumerate((9000, 150, 4000))]
    idx = gindex.build_index(contigs)
    genome = np.concatenate([c.codes for c in contigs])
    cfg = MapperConfig(qual_delta=64)
    reads = []
    for i in range(64):
        p = int(rng.integers(0, len(genome) - 55))
        r = genome[p:p + 50].copy()
        mut = rng.random(50) < 0.06
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append((f"r{i}", dna.decode(r), "I" * 50))
    entries = cand.prepare_reads(reads, cfg, idx.seed_set.min_span)

    from shrimp_tpu.pipeline.options import HitListOptions
    fields = ("rid", "st", "cn", "g_off", "w_len", "score_window_gen",
              "matches", "score_max", "anchor_x", "anchor_y",
              "anchor_length", "anchor_width")
    for st in (0, 1):
        ab = cb.anchors_batch(entries, idx, st, collapse=True,
                              list_cutoff=0xFFFFFFFF,
                              use_region_counts=False)
        heavy = rng.random(ab.n) < 0.3
        for mm, gl, thr, hv in [(1, False, 55.0, None),
                                (2, False, 55.0, None),
                                (3, False, 55.0, heavy),
                                (1, True, 55.0, None),
                                (2, False, -40.0, None),
                                (2, False, 90.0, None)]:
            opts = HitListOptions(gapless=gl, match_mode=mm,
                                  threshold=thr)
            got = cb._hit_list_native(lib, entries, idx, ab, opts, cfg, hv)
            want = cb._hit_list_numpy(entries, idx, ab, opts, cfg, hv)
            assert len(got.rid) == len(want.rid), (mm, gl, thr)
            for f in fields:
                assert np.array_equal(getattr(got, f), getattr(want, f)), \
                    (mm, gl, thr, f)


def test_anchors_read_major_vs_global_sort():
    """The read-major fused L3 (anchors_from_csr_rm, per-read in-cache
    sort) is byte-identical to the global (rid, x)-sort path across
    region pruning / collapse / strand."""
    import os

    import numpy as np

    from shrimp_tpu import dna
    from shrimp_tpu import index as gindex
    from shrimp_tpu import native
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline import candidates_batch as cb
    from shrimp_tpu.pipeline.options import MapperConfig

    lib = native.load_candidates()
    if lib is None or not hasattr(lib, "anchors_from_csr_rm"):
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(23)
    contigs = [fastx.Contig(name=f"c{i}",
                            codes=rng.integers(0, 4, ln).astype(np.int8))
               for i, ln in enumerate((30000, 500, 12000))]
    idx = gindex.build_index(contigs)
    genome = np.concatenate([c.codes for c in contigs])
    cfg = MapperConfig(qual_delta=64)
    reads = []
    for i in range(96):
        p = int(rng.integers(0, len(genome) - 55))
        r = genome[p:p + 50].copy()
        mut = rng.random(50) < 0.08
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append((f"r{i}", dna.decode(r), "I" * 50))
    entries = cand.prepare_reads(reads, cfg, idx.seed_set.min_span)

    for use_region in (True, False):
        for collapse in (True, False):
            for st in (0, 1):
                new = cb._anchors_fused(entries, idx, st, collapse,
                                        0xFFFFFFFF, use_region)
                os.environ["SHRIMP_TPU_NO_RM"] = "1"
                try:
                    old = cb._anchors_fused(entries, idx, st, collapse,
                                            0xFFFFFFFF, use_region)
                finally:
                    del os.environ["SHRIMP_TPU_NO_RM"]
                for f in ("rid", "st", "x", "y", "length", "weight",
                          "cn"):
                    assert np.array_equal(getattr(new, f),
                                          getattr(old, f)), \
                        (use_region, collapse, st, f)


def test_anchors_read_major_many_regions():
    """Stress the per-read region group table: a read whose postings
    scatter over ~1 region each (group count ~= posting count) must not
    overflow the scratch buffer (regression: reg_group is 16B vs the
    12B record slots) and must match the global-sort path."""
    import os

    import numpy as np

    from shrimp_tpu import dna
    from shrimp_tpu import index as gindex
    from shrimp_tpu import native
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline import candidates as cand
    from shrimp_tpu.pipeline import candidates_batch as cb
    from shrimp_tpu.pipeline.options import MapperConfig

    lib = native.load_candidates()
    if lib is None or not hasattr(lib, "anchors_from_csr_rm"):
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(41)
    # a 6 Mbp genome with one 50bp cassette planted once per ~2.5kb:
    # every kmer of a cassette-read posts ~2400 positions, one per region
    cassette = rng.integers(0, 4, 50).astype(np.int8)
    g = rng.integers(0, 4, 6_000_000).astype(np.int8)
    step = 2500
    for p in range(0, len(g) - 60, step):
        g[p:p + 50] = cassette
    idx = gindex.build_index([fastx.Contig(name="c0", codes=g)])
    cfg = MapperConfig(qual_delta=64)
    reads = [("r0", dna.decode(cassette), "I" * 50),
             ("r1", dna.decode(dna.reverse_complement(cassette)),
              "I" * 50)]
    entries = cand.prepare_reads(reads, cfg, idx.seed_set.min_span)
    for st in (0, 1):
        new = cb._anchors_fused(entries, idx, st, True, 0xFFFFFFFF, True)
        os.environ["SHRIMP_TPU_NO_RM"] = "1"
        try:
            old = cb._anchors_fused(entries, idx, st, True, 0xFFFFFFFF,
                                    True)
        finally:
            del os.environ["SHRIMP_TPU_NO_RM"]
        assert new.n > 1000
        for f in ("rid", "st", "x", "y", "length", "weight", "cn"):
            assert np.array_equal(getattr(new, f), getattr(old, f)), f

"""Vectorized batch candidate generation must match the per-read walk."""

import os

import numpy as np
import pytest

from shrimp_tpu import index as gindex
from shrimp_tpu.io import fastx
from shrimp_tpu.pipeline import candidates as cand
from shrimp_tpu.pipeline import candidates_batch as cb
from shrimp_tpu.pipeline.options import MapperConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def setup():
    idx = gindex.build_index(
        list(fastx.iter_contigs(os.path.join(GOLDEN, "golden_genome.fa"))))
    cfg = MapperConfig(qual_delta=64)
    recs = list(fastx.iter_reads(os.path.join(GOLDEN, "golden_reads.fq")))
    entries = [cand.prepare_read(r.name, r.seq, r.qual, cfg,
                                 idx.seed_set.min_span) for r in recs]
    return idx, cfg, entries


@pytest.mark.parametrize("st", [0, 1])
def test_anchors_match(setup, st):
    idx, cfg, entries = setup
    ab = cb.anchors_batch(entries, idx, st)
    for ri, re in enumerate(entries):
        mask = ab.rid == ri
        mi = cand.read_mapidxs(re, idx, st)
        a1 = cand.build_anchor_list(re, idx, st, mi,
                                    list_cutoff=idx.list_cutoff)
        np.testing.assert_array_equal(ab.x[mask], a1.x, err_msg=f"read {ri}")
        np.testing.assert_array_equal(ab.y[mask], a1.y)
        np.testing.assert_array_equal(ab.length[mask], a1.length)
        np.testing.assert_array_equal(ab.weight[mask], a1.weight)
        np.testing.assert_array_equal(ab.cn[mask], a1.cn)


@pytest.mark.parametrize("st", [0, 1])
def test_hits_match(setup, st):
    idx, cfg, entries = setup
    opts = cfg.unpaired_options()[0]
    ab = cb.anchors_batch(entries, idx, st)
    hb = cb.hit_list_batch(entries, idx, ab, opts.hit_list, cfg)
    for ri, re in enumerate(entries):
        mask = hb.rid == ri
        mi = cand.read_mapidxs(re, idx, st)
        a1 = cand.build_anchor_list(re, idx, st, mi,
                                    list_cutoff=idx.list_cutoff)
        h1 = cand.build_hit_list(re, idx, a1, opts.hit_list, cfg)
        np.testing.assert_array_equal(hb.g_off[mask], h1.g_off,
                                      err_msg=f"read {ri}")
        np.testing.assert_array_equal(hb.cn[mask], h1.cn)
        np.testing.assert_array_equal(hb.w_len[mask], h1.w_len)
        np.testing.assert_array_equal(hb.score_window_gen[mask],
                                      h1.score_window_gen)
        np.testing.assert_array_equal(hb.matches[mask], h1.matches)
        np.testing.assert_array_equal(hb.anchor_x[mask], h1.anchor_x)
        np.testing.assert_array_equal(hb.anchor_y[mask], h1.anchor_y)
        np.testing.assert_array_equal(hb.anchor_length[mask], h1.anchor_length)
        np.testing.assert_array_equal(hb.anchor_width[mask], h1.anchor_width)

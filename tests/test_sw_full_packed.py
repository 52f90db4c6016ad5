"""Band-packed pass-2 kernel (sw_full_batch_packed) vs the full-grid
banded kernel: scores, best cell, and the complete traceback must be
bit-identical for every lane (local + glocal, forward + revcmpl)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shrimp_tpu.ops import sw_full
from shrimp_tpu.ops.params import SWParams


def make_case(seed, B=64, G=96, R=64, rlen=50, W=24):
    rng = np.random.default_rng(seed)
    gb = rng.integers(0, 4, (B, G)).astype(np.int8)
    rb = np.full((B, R), -2, np.int8)
    for b in range(B):
        s = int(rng.integers(0, G - rlen))
        r = gb[b, s:s + rlen].copy()
        nmut = int(rng.integers(0, 6))
        for _ in range(nmut):
            q = int(rng.integers(0, rlen))
            r[q] = (r[q] + int(rng.integers(1, 4))) % 4
        rb[b, :rlen] = r
    rev = rng.random(B) < 0.5
    # plausible diagonal bands with varying anchors and pre/post spans
    anchor = rng.integers(0, G - rlen, B)
    bxmin = np.zeros((B, R), np.int32)
    bxmax = np.zeros((B, R), np.int32)
    for b in range(B):
        i = np.arange(R)
        lo = np.clip(i + int(anchor[b]) - int(rng.integers(4, 12)),
                     0, G - 1)
        hi = np.clip(lo + W - int(rng.integers(1, 8)), 0, G - 1)
        # x_min/x_max from compute_band are nondecreasing; enforce
        bxmin[b] = np.maximum.accumulate(lo)
        bxmax[b] = np.maximum.accumulate(np.maximum(hi, bxmin[b]))
    return gb, rb, rev, bxmin, bxmax


@pytest.mark.parametrize("loc", [True, False])
@pytest.mark.parametrize("seed", [1, 2])
def test_packed_equals_full(loc, seed):
    params = SWParams.letter_space()
    gb, rb, rev, bxmin, bxmax = make_case(seed)
    W = int((bxmax - bxmin).max()) + 1

    stats_f, ops_f = sw_full.sw_full_and_traceback_jax(
        jnp.asarray(gb), jnp.asarray(rb), jnp.asarray(rev), params,
        local_alignment=loc, band_xmin=jnp.asarray(bxmin),
        band_xmax=jnp.asarray(bxmax))
    stats_p, ops_p = sw_full.sw_full_and_traceback_packed_jax(
        jnp.asarray(gb), jnp.asarray(rb), jnp.asarray(rev),
        jnp.asarray(bxmin), jnp.asarray(bxmax), params,
        local_alignment=loc, W=W)
    stats_f = np.asarray(stats_f)
    stats_p = np.asarray(stats_p)
    ops_f = np.asarray(ops_f)
    ops_p = np.asarray(ops_p)
    bad = np.flatnonzero((stats_f != stats_p).any(axis=1))
    assert not len(bad), (bad[:5], stats_f[bad[:3]], stats_p[bad[:3]])
    for b in range(len(gb)):
        n = stats_f[b, 9]
        assert (ops_f[b, :n] == ops_p[b, :n]).all(), b


def test_packed_equals_full_wide_jump_band():
    """Bands whose x_min jumps by more than the packed width between
    rows (the i==ry transition of compute_band) must stay exact."""
    params = SWParams.letter_space()
    rng = np.random.default_rng(7)
    B, G, R, rlen = 32, 96, 64, 50
    gb = rng.integers(0, 4, (B, G)).astype(np.int8)
    rb = np.full((B, R), -2, np.int8)
    for b in range(B):
        s = int(rng.integers(0, G - rlen))
        rb[b, :rlen] = gb[b, s:s + rlen]
    rev = rng.random(B) < 0.5
    # real compute_band geometry: anchors in the middle of the window
    ax = rng.integers(10, 40, B).astype(np.int64)
    ay = rng.integers(0, 10, B).astype(np.int64)
    al = np.full(B, 30, np.int64)
    aw = rng.integers(9, 17, B).astype(np.int64)
    glen = np.full(B, G, np.int64)
    bxmin, bxmax = sw_full.compute_band(ax, ay, al, aw, glen, R)
    W = int((bxmax - bxmin).max()) + 1

    stats_f, ops_f = sw_full.sw_full_and_traceback_jax(
        jnp.asarray(gb), jnp.asarray(rb), jnp.asarray(rev), params,
        local_alignment=False, band_xmin=jnp.asarray(bxmin),
        band_xmax=jnp.asarray(bxmax))
    stats_p, ops_p = sw_full.sw_full_and_traceback_packed_jax(
        jnp.asarray(gb), jnp.asarray(rb), jnp.asarray(rev),
        jnp.asarray(bxmin), jnp.asarray(bxmax), params,
        local_alignment=False, W=W)
    stats_f = np.asarray(stats_f)
    stats_p = np.asarray(stats_p)
    assert (stats_f == stats_p).all(), \
        np.flatnonzero((stats_f != stats_p).any(axis=1))[:5]
    ops_f = np.asarray(ops_f)
    ops_p = np.asarray(ops_p)
    for b in range(B):
        n = stats_f[b, 9]
        assert (ops_f[b, :n] == ops_p[b, :n]).all(), b

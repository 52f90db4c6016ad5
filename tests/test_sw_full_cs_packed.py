"""Band-packed CS pass-2 kernel (sw_full_cs_batch_packed) vs the
full-grid banded CS kernel: scores, best cell, and the complete
traceback must be bit-identical for every lane (local + glocal,
forward + revcmpl, global + per-colour crossover penalties, taboo)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shrimp_tpu import dna
from shrimp_tpu.ops import sw_full, sw_full_cs
from shrimp_tpu.ops.params import SWParams

PARAMS = SWParams.colour_space()


def make_qr4(colours, initbp):
    R = len(colours)
    qr4 = np.empty((4, R), np.int8)
    for k in range(4):
        letter = (k + initbp) % 4
        for j in range(R):
            c = int(colours[j])
            if not (0 <= c <= 3):
                qr4[k, j] = dna.BASE_N
                letter = (k + initbp) % 4
            else:
                letter = letter ^ c
                qr4[k, j] = letter
    return qr4


def make_case(seed, B=48, G=96, R=64, rlen=50, W=24, per_colour=False,
              n_rate=0.0):
    rng = np.random.default_rng(seed)
    gb = rng.integers(0, 4, (B, G)).astype(np.int8)
    qr4 = np.full((B, 4, R), -2, np.int8)
    xover = np.full((B, R), PARAMS.crossover, np.int32)
    for b in range(B):
        s = int(rng.integers(0, G - rlen))
        initbp = int(rng.integers(0, 4))
        letters = np.concatenate(([initbp], gb[b, s:s + rlen]))
        colours = (letters[:-1] ^ letters[1:]).astype(np.int8)
        noise = rng.random(rlen) < 0.15
        colours = np.where(noise, rng.integers(0, 4, rlen),
                           colours).astype(np.int8)
        if n_rate:
            colours[rng.random(rlen) < n_rate] = dna.BASE_N
        qr4[b, :, :rlen] = make_qr4(colours, initbp)
        if per_colour:
            xover[b, :rlen] = -rng.integers(20, 181, rlen)
    rev = rng.random(B) < 0.5
    # real compute_band geometry
    ax = rng.integers(5, G - rlen - 2, B).astype(np.int64)
    ay = rng.integers(0, 10, B).astype(np.int64)
    al = np.full(B, 30, np.int64)
    aw = rng.integers(9, 17, B).astype(np.int64)
    glen = np.full(B, G, np.int64)
    bxmin, bxmax = sw_full.compute_band(ax, ay, al, aw, glen, R)
    return gb, qr4, xover, rev, bxmin, bxmax


@pytest.mark.parametrize("loc", [True, False])
@pytest.mark.parametrize("seed,per_colour,taboo", [
    (1, False, 0), (2, True, 0), (3, False, 4), (4, True, 7)])
def test_cs_packed_equals_full(loc, seed, per_colour, taboo):
    gb, qr4, xover, rev, bxmin, bxmax = make_case(
        seed, per_colour=per_colour)
    W = int((bxmax - bxmin).max()) + 1

    stats_f, ops_f = sw_full_cs.sw_full_cs_and_traceback_jax(
        jnp.asarray(gb), jnp.asarray(qr4), jnp.asarray(xover),
        jnp.asarray(rev), PARAMS, loc, taboo,
        band_xmin=jnp.asarray(bxmin), band_xmax=jnp.asarray(bxmax))
    stats_p, ops_p = sw_full_cs.sw_full_cs_and_traceback_packed_jax(
        jnp.asarray(gb), jnp.asarray(qr4), jnp.asarray(xover),
        jnp.asarray(rev), jnp.asarray(bxmin), jnp.asarray(bxmax),
        PARAMS, loc, taboo, W=W)
    stats_f = np.asarray(stats_f)
    stats_p = np.asarray(stats_p)
    ops_f = np.asarray(ops_f)
    ops_p = np.asarray(ops_p)
    bad = np.flatnonzero((stats_f != stats_p).any(axis=1))
    assert not len(bad), (bad[:5], stats_f[bad[:3]], stats_p[bad[:3]])
    for b in range(len(gb)):
        n = stats_f[b, 9]
        assert (ops_f[b, :n] == ops_p[b, :n]).all(), b


def test_cs_packed_with_n_colours():
    """N colours (quality 255) reset the decode chain; the packed kernel
    must reproduce the N-handling byte-for-byte."""
    gb, qr4, xover, rev, bxmin, bxmax = make_case(9, n_rate=0.06)
    W = int((bxmax - bxmin).max()) + 1
    stats_f, ops_f = sw_full_cs.sw_full_cs_and_traceback_jax(
        jnp.asarray(gb), jnp.asarray(qr4), jnp.asarray(xover),
        jnp.asarray(rev), PARAMS, True, 0,
        band_xmin=jnp.asarray(bxmin), band_xmax=jnp.asarray(bxmax))
    stats_p, ops_p = sw_full_cs.sw_full_cs_and_traceback_packed_jax(
        jnp.asarray(gb), jnp.asarray(qr4), jnp.asarray(xover),
        jnp.asarray(rev), jnp.asarray(bxmin), jnp.asarray(bxmax),
        PARAMS, True, 0, W=W)
    stats_f = np.asarray(stats_f)
    stats_p = np.asarray(stats_p)
    assert (stats_f == stats_p).all(), \
        np.flatnonzero((stats_f != stats_p).any(axis=1))[:5]
    ops_f = np.asarray(ops_f)
    ops_p = np.asarray(ops_p)
    for b in range(len(gb)):
        n = stats_f[b, 9]
        assert (ops_f[b, :n] == ops_p[b, :n]).all(), b

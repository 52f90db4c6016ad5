"""Colour-space full-SW kernel vs the scalar oracle."""

import numpy as np
import pytest

from shrimp_tpu import dna
from shrimp_tpu.ops import sw_full_cs
from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops.sw_vector import GENOME_PAD, READ_PAD

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


def random_case(rng, G, R, n_rate=0.0):
    genome = rng.integers(0, 4, G).astype(np.int8)
    if n_rate:
        genome[rng.random(G) < n_rate] = dna.BASE_N
    initbp = int(rng.integers(0, 4))
    # colour read roughly matching a genome slice, with noise
    start = int(rng.integers(0, max(1, G - R)))
    letters = np.concatenate(([initbp], genome[start:start + R]))
    letters = np.where(letters > 3, 0, letters)
    colours = (letters[:-1] ^ letters[1:]).astype(np.int8)
    noise = rng.random(len(colours)) < 0.15
    colours = np.where(noise, rng.integers(0, 4, len(colours)),
                       colours).astype(np.int8)
    if n_rate:
        colours[rng.random(len(colours)) < n_rate] = dna.BASE_N
    if len(colours) < R:
        colours = np.concatenate(
            [colours, rng.integers(0, 4, R - len(colours)).astype(np.int8)])
    return genome, colours[:R], initbp


def run_pair(genome, colours, initbp, xover_row, revcmpl, local, taboo=0):
    qr4 = make_qr4(colours, initbp)
    stats, ops = sw_full_cs.sw_full_cs_and_traceback_jax(
        genome[None, :].astype(np.int8),
        qr4[None, :, :],
        np.asarray(xover_row, np.int32)[None, :],
        np.array([revcmpl]),
        PARAMS, local, taboo)
    stats = np.asarray(stats)[0]
    ops = np.asarray(ops)[0][:stats[9]]
    oracle = sw_full_cs.sw_full_cs_numpy(
        genome, qr4, xover_row, revcmpl, PARAMS, local, taboo)
    return stats, ops, oracle, qr4


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("revcmpl", [False, True])
def test_kernel_matches_oracle(local, revcmpl):
    rng = np.random.default_rng(42 + local * 2 + revcmpl)
    for trial in range(8):
        G, R = 48, 20
        genome, colours, initbp = random_case(rng, G, R,
                                              n_rate=0.05 * (trial % 2))
        xover = np.full(R, PARAMS.crossover, np.int32)
        if trial % 3 == 0:
            xover = -rng.integers(1, 41, R).astype(np.int32)
        stats, ops, oracle, qr4 = run_pair(genome, colours, initbp, xover,
                                           revcmpl, local)
        assert stats[0] == oracle.score, (trial, stats[0], oracle.score)
        if oracle.score <= 0:
            continue
        assert stats[1] == oracle.read_start
        assert stats[2] == oracle.genome_start
        assert stats[3] == oracle.matches
        assert stats[4] == oracle.mismatches
        assert stats[5] == oracle.insertions
        assert stats[6] == oracle.deletions
        assert stats[10] == oracle.crossovers
        assert np.array_equal(ops, oracle.ops)
        db, qa = sw_full_cs.render_alignment_cs(
            ops, genome, qr4, int(stats[2]), int(stats[1]))
        assert db == oracle.dbalign
        assert qa == oracle.qralign


def test_perfect_read_no_crossovers():
    rng = np.random.default_rng(7)
    G, R = 40, 16
    genome = rng.integers(0, 4, G).astype(np.int8)
    initbp = 2
    start = 10
    letters = np.concatenate(([initbp], genome[start:start + R]))
    colours = (letters[:-1] ^ letters[1:]).astype(np.int8)
    xover = np.full(R, PARAMS.crossover, np.int32)
    stats, ops, oracle, _ = run_pair(genome, colours, initbp, xover,
                                     False, True)
    assert stats[0] == R * PARAMS.match
    assert stats[3] == R and stats[4] == 0
    assert stats[10] == 0


def test_single_colour_error_is_crossover():
    rng = np.random.default_rng(9)
    G, R = 40, 16
    genome = rng.integers(0, 4, G).astype(np.int8)
    initbp = 1
    start = 8
    letters = np.concatenate(([initbp], genome[start:start + R]))
    colours = (letters[:-1] ^ letters[1:]).astype(np.int8)
    colours[7] ^= 2   # one colour flip => crossover, not letter mismatch
    xover = np.full(R, PARAMS.crossover, np.int32)
    stats, ops, oracle, _ = run_pair(genome, colours, initbp, xover,
                                     False, True)
    # crossing over twice (in and out) recovers all letter matches
    assert stats[0] == oracle.score
    assert oracle.crossovers >= 1
    assert stats[10] == oracle.crossovers

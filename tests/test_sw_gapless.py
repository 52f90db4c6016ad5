"""Gapless-extension kernel vs a direct transliteration oracle of
sw-gapless.c's scan loop (:58-117)."""

import numpy as np

from shrimp_tpu.ops import sw_gapless
from shrimp_tpu.ops.params import SWParams


def oracle(genome, glen, read, rlen, g_idx, r_idx, match, mismatch,
           genome_ls=None, init_colour_match=None):
    """The C loop, verbatim semantics."""
    if g_idx < r_idx:
        g_left, r_left = 0, r_idx - g_idx
    else:
        g_left, r_left = g_idx - r_idx, 0
    g_right, r_right = g_left, r_left

    score = 0
    if genome_ls is not None and r_left == 0:
        if init_colour_match:
            score = match
        else:
            r_left += 1
            g_left += 1
        r_right += 1
        g_right += 1
    max_score = score
    while g_right < glen and r_right < rlen:
        score += match if genome[g_right] == read[r_right] else mismatch
        if score > max_score:
            max_score = score
        g_right += 1
        r_right += 1
        if score < 0:
            score = 0
    return max_score


def gather_diag(genome, glen, read, rlen, g_idx, r_idx):
    """Build the kernel's [R]-shaped diagonal rows like the mapper does."""
    if g_idx < r_idx:
        g_left, r_left = 0, r_idx - g_idx
    else:
        g_left, r_left = g_idx - r_idx, 0
    R = rlen
    drow = np.full(R, sw_gapless.GENOME_PAD, np.int8)
    rrow = np.full(R, sw_gapless.READ_PAD, np.int8)
    n = min(glen - g_left, rlen - r_left)
    drow[:n] = genome[g_left:g_left + n]
    rrow[:n] = read[r_left:r_left + n]
    return drow, rrow


def test_vs_oracle_random():
    rng = np.random.default_rng(3)
    p = SWParams.letter_space()
    for _ in range(50):
        glen = int(rng.integers(20, 200))
        rlen = int(rng.integers(5, 60))
        genome = rng.integers(0, 4, glen).astype(np.int8)
        read = rng.integers(0, 4, rlen).astype(np.int8)
        g_idx = int(rng.integers(0, glen))
        r_idx = int(rng.integers(0, rlen))
        want = oracle(genome, glen, read, rlen, g_idx, r_idx,
                      p.match, p.mismatch)
        d, r = gather_diag(genome, glen, read, rlen, g_idx, r_idx)
        got = int(np.asarray(sw_gapless.gapless_score_batch(
            d[None, :], r[None, :], p))[0])
        assert got == want, (g_idx, r_idx, got, want)


def test_batched_matches_scalar():
    rng = np.random.default_rng(5)
    p = SWParams.letter_space()
    glen, rlen = 120, 40
    genome = rng.integers(0, 4, glen).astype(np.int8)
    rows_d, rows_r, wants = [], [], []
    for _ in range(64):
        read = rng.integers(0, 4, rlen).astype(np.int8)
        g_idx = int(rng.integers(0, glen))
        r_idx = int(rng.integers(0, rlen))
        wants.append(oracle(genome, glen, read, rlen, g_idx, r_idx,
                            p.match, p.mismatch))
        d, r = gather_diag(genome, glen, read, rlen, g_idx, r_idx)
        rows_d.append(d)
        rows_r.append(r)
    got = np.asarray(sw_gapless.gapless_score_batch(
        np.stack(rows_d), np.stack(rows_r), p))
    assert got.tolist() == wants


def test_cs_forced_first_colour():
    """CS: read position 0 on the diagonal is force-compared; a mismatch
    skips the position (contributes 0), a match scores +match
    (sw-gapless.c:85-95)."""
    p = SWParams.colour_space()
    rng = np.random.default_rng(7)
    for forced in (True, False):
        glen, rlen = 60, 20
        genome = rng.integers(0, 4, glen).astype(np.int8)
        read = rng.integers(0, 4, rlen).astype(np.int8)
        g_idx, r_idx = 30, 4          # g_idx >= r_idx -> r_left == 0
        want = oracle(genome, glen, read, rlen, g_idx, r_idx,
                      p.match, p.mismatch, genome_ls=True,
                      init_colour_match=forced)
        d, r = gather_diag(genome, glen, read, rlen, g_idx, r_idx)
        s0 = np.array([p.match if forced else 0], np.int32)
        got = int(np.asarray(sw_gapless.gapless_score_batch(
            d[None, :], r[None, :], p, s0=s0))[0])
        assert got == want

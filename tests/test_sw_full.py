"""Full-SW kernel vs a direct NumPy oracle implementing the reference's
3-state DP semantics (common/sw-full-ls.c)."""

import numpy as np
import pytest

from shrimp_tpu import dna
from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops import sw_full
from shrimp_tpu.ops.sw_vector import GENOME_PAD, READ_PAD

NEG = -(10 ** 9)


def oracle_full_sw(g, r, params=SWParams(), local=True, revcmpl=False):
    """Row-major 3-state DP with reference tie-breaks; returns
    (score, end_i, end_j, states_at_end)."""
    G, R = len(g), len(r)
    aoe = params.a_gap_open + params.a_gap_extend   # negative
    ae = params.a_gap_extend
    boe = params.b_gap_open + params.b_gap_extend
    be = params.b_gap_extend

    def init_cell(local_style):
        if local_style:
            return [0, params.b_gap_open, params.a_gap_open]  # NW, N, W
        return [NEG, NEG, NEG]

    # matrix[(i, j)] for virtual i in -1..R-1, j in -1..G-1
    S = {}
    for j in range(-1, G):
        S[(-1, j)] = init_cell(True)
    for i in range(0, R):
        S[(i, -1)] = init_cell(local)

    best, best_i, best_j = 0, 0, 0
    for i in range(R):
        for j in range(G):
            ms = params.match if g[j] == r[i] else params.mismatch
            nw = S[(i - 1, j - 1)]
            n_ = S[(i - 1, j)]
            w_ = S[(i, j - 1)]
            # NW state
            if not revcmpl:
                cands = [nw[0], nw[1], nw[2]]
            else:
                cands = [nw[2], nw[1], nw[0]]
            s_nw = max(cands) + ms
            # N state
            if not revcmpl:
                s_n = max(n_[0] + boe, n_[1] + be)
            else:
                s_n = max(n_[1] + be, n_[0] + boe)
            # W state
            if not revcmpl:
                s_w = max(w_[0] + aoe, w_[2] + ae)
            else:
                s_w = max(w_[2] + ae, w_[0] + aoe)
            if local:
                s_nw = max(s_nw, 0)
                s_n = max(s_n, 0)
                s_w = max(s_w, 0)
            S[(i, j)] = [s_nw, s_n, s_w]
            if local or i == R - 1:
                cell = max(s_nw, s_n, s_w)
                if cell > best:
                    best, best_i, best_j = cell, i, j
    return best, best_i, best_j, S.get((best_i, best_j), [0, 0, 0])


def run_kernel(g, r, params=SWParams(), local=True, revcmpl=False):
    gb = np.full((1, len(g)), GENOME_PAD, np.int32)
    gb[0, :] = g
    rb = np.full((1, len(r)), READ_PAD, np.int32)
    rb[0, :] = r
    return sw_full.sw_full_with_traceback(
        gb, rb, np.array([revcmpl]), params, local)[0]


def test_perfect_match():
    g = dna.encode("TTACGTACGTTT")
    r = dna.encode("ACGTACGT")
    res = run_kernel(g, r)
    assert res.score == 80
    assert res.matches == 8 and res.mismatches == 0
    assert res.genome_start == 2 and res.read_start == 0
    assert res.rmapped == 8 and res.gmapped == 8
    assert res.dbalign == "ACGTACGT" and res.qralign == "ACGTACGT"


def test_mismatch_and_stats():
    g = dna.encode("AAAACGTAAAA")
    r = dna.encode("ACGA")  # last base mismatches genome T
    res = run_kernel(g, r)
    oracle = oracle_full_sw(g, r)
    assert res.score == oracle[0]


def test_gap_alignment():
    # genome has 2 extra bases mid-read: read must open an a-gap
    g = dna.encode("TTTACGTTTACGAAA")
    r = dna.encode("ACGTTACG")
    res = run_kernel(g, r)
    o_score, oi, oj, _ = oracle_full_sw(g, r)
    assert res.score == o_score
    # check ops are consistent
    assert res.matches + res.mismatches + res.deletions == res.rmapped
    assert res.matches + res.mismatches + res.insertions == res.gmapped
    assert len(res.dbalign) == len(res.qralign) == len(res.ops)


@pytest.mark.parametrize("local", [True, False])
@pytest.mark.parametrize("revcmpl", [False, True])
def test_random_vs_oracle(local, revcmpl):
    rng = np.random.default_rng(3)
    G, R = 40, 25
    gb = np.zeros((24, G), np.int32)
    rb = np.zeros((24, R), np.int32)
    gs, rs = [], []
    for k in range(24):
        g = rng.integers(0, 4, size=G).astype(np.int32)
        start = rng.integers(0, G - R)
        r = g[start:start + R].copy()
        nmut = rng.integers(0, 4)
        for _ in range(nmut):
            p = rng.integers(0, R)
            r[p] = (r[p] + rng.integers(1, 4)) % 4
        gb[k] = g
        rb[k] = r
        gs.append(g)
        rs.append(r)
    score, bi, bj, states, bits = sw_full.sw_full_batch(
        gb, rb, np.full(24, revcmpl), SWParams(), local)
    score = np.asarray(score)
    bi, bj = np.asarray(bi), np.asarray(bj)
    states = np.asarray(states)
    for k in range(24):
        o_score, oi, oj, o_states = oracle_full_sw(
            gs[k], rs[k], local=local, revcmpl=revcmpl)
        assert score[k] == o_score, k
        if o_score > 0:
            assert (bi[k], bj[k]) == (oi, oj), (k, o_score)
            assert list(states[k]) == o_states, k


def test_traceback_reconstructs_score():
    """Recompute the score from the traceback ops — must equal DP score."""
    rng = np.random.default_rng(11)
    p = SWParams()
    for _ in range(10):
        g = rng.integers(0, 4, size=50).astype(np.int32)
        r = g[5:35].copy()
        r = np.delete(r, 10)
        r[3] = (r[3] + 1) % 4
        res = run_kernel(g, r, p)
        # walk ops, recompute
        s = 0
        gi, ri = res.genome_start, res.read_start
        prev = None
        for op in res.ops:
            if op == sw_full.OP_MATCH:
                s += p.match if g[gi] == r[ri] else p.mismatch
                gi += 1
                ri += 1
            elif op == sw_full.OP_INS:
                s += p.a_gap_extend + (p.a_gap_open if prev != sw_full.OP_INS else 0)
                gi += 1
            else:
                s += p.b_gap_extend + (p.b_gap_open if prev != sw_full.OP_DEL else 0)
                ri += 1
            prev = op
        assert s == res.score


def test_glocal_consumes_whole_read():
    g = dna.encode("ACGTACGTACGT")
    r = dna.encode("TTTTACGT")  # head mismatches; glocal must include it
    res = run_kernel(g, r, local=False)
    assert res.rmapped == len(r)
    assert res.read_start == 0

import numpy as np

from shrimp_tpu import dna, index, seeds
from shrimp_tpu.io import fastx


def mk_contig(name, seq):
    return fastx.Contig(name=name, codes=dna.encode(seq))


def brute_force_postings(genome_codes, seed):
    """Oracle: enumerate every valid window and its mapidx."""
    out = {}
    L = len(genome_codes)
    for p in range(L - seed.span + 1):
        window = genome_codes[p:p + seed.span]
        if np.any(window == dna.BASE_N):
            continue
        idx = 0
        for k, o in enumerate(seed.ones_idx):
            idx |= (int(window[o]) & 3) << (2 * k)
        out.setdefault(idx, []).append(p)
    return out


def test_tiny_index_vs_bruteforce():
    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    ss = seeds.make_seed_set(["1101"])
    idx = index.build_index([mk_contig("c1", seq)], ss)
    oracle = brute_force_postings(dna.encode(seq), ss.seeds[0])
    off, pos = idx.offsets[0], idx.positions[0]
    for mapidx in range(len(off) - 1):
        got = list(pos[off[mapidx]:off[mapidx + 1]])
        assert got == oracle.get(mapidx, []), mapidx


def test_n_windows_skipped():
    seq = "ACGTNACGT"
    ss = seeds.make_seed_set(["111"])
    idx = index.build_index([mk_contig("c1", seq)], ss)
    all_pos = sorted(idx.positions[0])
    # windows at 2,3,4 contain the N at global pos 4
    assert all_pos == [0, 1, 5, 6]


def test_multi_contig_global_coords():
    ss = seeds.make_seed_set(["11"])
    idx = index.build_index([mk_contig("a", "ACGT"), mk_contig("b", "GGCC")], ss)
    assert list(idx.contig_offsets) == [0, 4]
    # no window spans the contig boundary (positions 3..4)
    assert 3 not in idx.positions[0]
    assert idx.contig_of(np.array([0, 3, 4, 7])).tolist() == [0, 0, 1, 1]


def test_trim():
    seq = "AAAAAAAAAAAAACGT"  # poly-A: bucket AA very long
    ss = seeds.make_seed_set(["11"])
    idx = index.build_index([mk_contig("c", seq)], ss)
    aa_bucket = 0  # A=0,A=0
    long_len = idx.offsets[0][aa_bucket + 1] - idx.offsets[0][aa_bucket]
    assert long_len == 12
    idx.trim(4)
    assert idx.offsets[0][aa_bucket + 1] - idx.offsets[0][aa_bucket] == 0
    # shorter lists survive
    total = idx.offsets[0][-1]
    assert total > 0 and total == len(idx.positions[0])


def test_save_load_roundtrip(tmp_path):
    seq = "ACGTACGTTGCAACGT"
    idx = index.build_index([mk_contig("c", seq)], seeds.make_seed_set(["101"]))
    prefix = str(tmp_path / "g")
    idx.save(prefix)
    idx2 = index.GenomeIndex.load(prefix)
    np.testing.assert_array_equal(idx.genome, idx2.genome)
    np.testing.assert_array_equal(idx.positions[0], idx2.positions[0])
    np.testing.assert_array_equal(idx.offsets[0], idx2.offsets[0])
    assert idx2.seed_set.seeds[0].pattern == "101"


def test_colour_space_index():
    seq = "ACGTACGT"
    idx = index.build_index([mk_contig("c", seq)],
                            seeds.make_seed_set(["11"]), colour_space=True)
    assert idx.genome_cs is not None
    # colours of ACGTACGT with leading T: 3,1,3,1,3,1,3,1 -> windows "31"/"13"
    expected = dna.letters_to_colours(dna.encode(seq))
    np.testing.assert_array_equal(idx.genome_cs, expected)


def test_default_seeds_index_smoke():
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    idx = index.build_index([mk_contig("c", seq)])
    assert len(idx.offsets) == 3  # default w12 has 3 seeds
    for sn, s in enumerate(idx.seed_set.seeds):
        assert idx.offsets[sn][-1] == 2000 - s.span + 1

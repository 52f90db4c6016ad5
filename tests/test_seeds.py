import numpy as np
import pytest

from shrimp_tpu import seeds


def test_parse_seed_basic():
    # same assertions as the reference CUnit test (tests/test.c:127-144)
    s = seeds.parse_seed("100011110101")
    assert s.span == 12
    assert s.weight == 7
    np.testing.assert_array_equal(s.ones_idx, [0, 4, 5, 6, 7, 9, 11])


def test_parse_seed_with_positions():
    s = seeds.parse_seed("100011110101:0|1|3|11|22|25|77")
    assert s.span == 12 and s.weight == 7
    np.testing.assert_array_equal(s.positions, [0, 1, 3, 11, 22, 25, 77])


def test_parse_seed_invalid():
    with pytest.raises(ValueError):
        seeds.parse_seed("11012")
    with pytest.raises(ValueError):
        seeds.parse_seed("1" * 70)


def test_default_seeds_w12():
    ss = seeds.default_seeds()
    assert len(ss) == 3
    assert all(s.weight == 12 for s in ss)
    assert ss[0].pattern == "11110111101111"


def test_default_seeds_weights():
    for w, n in [(10, 4), (11, 4), (12, 3), (16, 4), (18, 4)]:
        ss = seeds.default_seeds(w)
        assert len(ss) == n
        assert all(s.weight == w for s in ss)


def test_seed_set_validation():
    with pytest.raises(ValueError):
        seeds.make_seed_set(["1" * 16])  # weight 16 unhashed > 14
    ss = seeds.make_seed_set(["1" * 16], use_hashing=True)
    assert ss.table_sizes() == [1 << 24]


def test_mirna_seeds():
    ss = seeds.mirna_seeds()
    assert len(ss) == 5
    assert all(s.span == 20 for s in ss)

import numpy as np
import pytest

from shrimp_tpu import dna


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = dna.encode(s)
    assert dna.decode(codes) == "ACGTNACGTN"
    assert list(codes[:4]) == [0, 1, 2, 3]
    assert codes[4] == dna.BASE_N


def test_encode_iupac():
    # IUPAC codes map per common/fasta.h:26-48
    codes = dna.encode("MRWSYKVHDBXU")
    assert list(codes) == [5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 4]


def test_encode_colour_space():
    codes = dna.encode("0123.")
    assert list(codes) == [0, 1, 2, 3, dna.BASE_N]
    assert dna.decode(codes, dna.COLOUR_SPACE) == "0123."


def test_encode_invalid_raises():
    with pytest.raises(ValueError):
        dna.encode("ACGT%")


def test_reverse_complement():
    codes = dna.encode("AACGT")
    rc = dna.reverse_complement(codes)
    assert dna.decode(rc) == "ACGTT"
    # IUPAC complements: M<->K, R<->Y, W->W, S->S (util.h:129-146)
    assert dna.decode(dna.reverse_complement(dna.encode("MRWSYK"))) == "MRSWYK"


def test_letters_to_colours_xor():
    # T->A->C->G->T with implicit leading T: colours are XOR of neighbours
    codes = dna.encode("ACGT")
    col = dna.letters_to_colours(codes)  # prev=T(3): 3^0=3, 0^1=1, 1^2=3, 2^3=1
    assert list(col) == [3, 1, 3, 1]


def test_colours_roundtrip():
    rng = np.random.default_rng(0)
    letters = rng.integers(0, 4, size=50).astype(np.int8)
    colours = dna.letters_to_colours(letters, init_base=dna.BASE_T)
    back = dna.colours_to_letters(colours, init_base=dna.BASE_T)
    np.testing.assert_array_equal(letters, back)


def test_colours_n_poisons():
    col = dna.letters_to_colours(dna.encode("ANGT"))
    assert col[1] == dna.BASE_N and col[2] == dna.BASE_N
    # decoding an N colour poisons everything after
    letters = dna.colours_to_letters(np.array([1, 15, 2], dtype=np.int8), 0)
    assert letters[0] == 1 and letters[1] == dna.BASE_N and letters[2] == dna.BASE_N


def test_cs_reverse_is_plain_reversal():
    col = np.array([0, 1, 2, 3], dtype=np.int8)
    np.testing.assert_array_equal(dna.reverse_complement_cs(col), col[::-1])

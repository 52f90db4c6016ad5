import numpy as np
import pytest

from shrimp_tpu import dna
from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops import sw_vector


def _pad(arrs, L, fill):
    out = np.full((len(arrs), L), fill, np.int32)
    for i, a in enumerate(arrs):
        out[i, :len(a)] = a
    return out


def run_batch(genomes, reads, params=SWParams()):
    G = max(len(g) for g in genomes)
    R = max(len(r) for r in reads)
    gb = _pad(genomes, G, sw_vector.GENOME_PAD)
    rb = _pad(reads, R, sw_vector.READ_PAD)
    return np.asarray(sw_vector.sw_score_batch(gb, rb, params))


def test_perfect_match():
    g = dna.encode("ACGTACGTACGT")
    r = dna.encode("ACGTACGT")
    scores = run_batch([g], [r])
    assert scores[0] == 8 * 10


def test_single_mismatch():
    g = dna.encode("AAAACCCCGGGG")
    r = dna.encode("AACACCCC")  # one mismatch mid-read
    oracle = sw_vector.sw_score_numpy(g, r)
    assert run_batch([g], [r])[0] == oracle


def test_gap_costs():
    # read with a deletion vs genome: ACGTACGT vs ACGT-ACGT window
    g = dna.encode("ACGTAACGT")  # genome has extra A
    r = dna.encode("ACGTACGT")
    s = run_batch([g], [r])[0]
    # aligning through the gap: 8 matches + a-gap open+ext = 80 - 40 = 40
    # vs best exact submatch ACGTA (50): oracle decides
    assert s == sw_vector.sw_score_numpy(g, r)


def test_empty_overlap_scores_zero():
    g = dna.encode("AAAA")
    r = dna.encode("GGGG")
    assert run_batch([g], [r])[0] == 0


def test_batch_vs_oracle_random():
    rng = np.random.default_rng(42)
    genomes, reads = [], []
    for _ in range(32):
        genomes.append(rng.integers(0, 4, size=rng.integers(20, 70)).astype(np.int8))
        reads.append(rng.integers(0, 4, size=rng.integers(10, 50)).astype(np.int8))
    scores = run_batch(genomes, reads)
    for k in range(32):
        assert scores[k] == sw_vector.sw_score_numpy(genomes[k], reads[k]), k


def test_n_matches_n():
    # reference quirk: equal 4-bit codes match, including N==N
    g = np.array([dna.BASE_N] * 8, np.int8)
    r = np.array([dna.BASE_N] * 8, np.int8)
    assert run_batch([g], [r])[0] == 80


@pytest.mark.parametrize("params", [
    SWParams(),
    SWParams(match=5, mismatch=-4, a_gap_open=-10, a_gap_extend=-1,
             b_gap_open=-6, b_gap_extend=-2),
])
def test_asymmetric_gaps(params):
    rng = np.random.default_rng(7)
    for _ in range(8):
        g = rng.integers(0, 4, size=60).astype(np.int8)
        # embed a mutated copy of a read
        r = g[10:40].copy()
        r = np.delete(r, 5)          # deletion
        r[12] = (r[12] + 1) % 4      # SNP
        assert run_batch([g], [r], params)[0] == \
            sw_vector.sw_score_numpy(g, r, params)


def test_row_scan_equals_wavefront():
    """sw_score_batch_rows (cummax affine rows) == sw_score_batch, including
    the CS row-0 plane and asymmetric gap costs."""
    import jax.numpy as jnp
    import numpy as np

    from shrimp_tpu.ops import sw_vector as sv
    from shrimp_tpu.ops.params import SWParams

    rng = np.random.default_rng(123)
    B, G, R = 64, 96, 48
    genome = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    read = np.full((B, R), sv.READ_PAD, np.int8)
    for b in range(B):
        L = int(rng.integers(16, R + 1))
        s = int(rng.integers(0, G - L))
        read[b, :L] = genome[b, s:s + L]
        for _ in range(int(rng.integers(0, 5))):
            read[b, int(rng.integers(L))] = rng.integers(0, 4)
    row0 = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    for p, r0 in [(SWParams.letter_space(), None),
                  (SWParams.colour_space(), row0),
                  (SWParams.letter_space().with_(
                      a_gap_open=-100, a_gap_extend=-1,
                      b_gap_open=-20, b_gap_extend=-9), None)]:
        a = np.asarray(sv.sw_score_batch(
            jnp.asarray(genome), jnp.asarray(read), p,
            None if r0 is None else jnp.asarray(r0)))
        b = np.asarray(sv.sw_score_batch_rows(
            jnp.asarray(genome), jnp.asarray(read), p,
            None if r0 is None else jnp.asarray(r0)))
        assert np.array_equal(a, b)


def test_pallas_kernel_equals_wavefront():
    """The Pallas VMEM kernel (ops/sw_vector_pallas.py) matches the
    lax.scan wavefront bit-for-bit (interpret mode on the CPU platform;
    the compiled Mosaic kernel is verified on-chip)."""
    import jax.numpy as jnp
    import numpy as np

    from shrimp_tpu.ops import sw_vector as sv
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.ops.sw_vector_pallas import sw_score_batch_pallas

    rng = np.random.default_rng(7)
    B, G, R = 32, 160, 48
    genome = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    read = np.full((B, R), sv.READ_PAD, np.int8)
    for b in range(B):
        L = int(rng.integers(16, R + 1))
        s = int(rng.integers(0, G - L))
        read[b, :L] = genome[b, s:s + L]
        for _ in range(int(rng.integers(0, 5))):
            read[b, int(rng.integers(L))] = rng.integers(0, 4)
    for p in (SWParams.letter_space(),
              SWParams.letter_space().with_(
                  a_gap_open=-100, a_gap_extend=-1,
                  b_gap_open=-20, b_gap_extend=-9)):
        ref = np.asarray(sv.sw_score_batch(jnp.asarray(genome),
                                           jnp.asarray(read), p))
        pal = np.asarray(sw_score_batch_pallas(
            jnp.asarray(genome), jnp.asarray(read), p, interpret=True))
        assert np.array_equal(ref, pal)


def test_pallas_kernel_row0_plane():
    """Pallas engine matches the wavefront with the colour-space row-0
    genome plane (sw-vector.c:111-147 contract)."""
    import jax.numpy as jnp
    import numpy as np

    from shrimp_tpu.ops import sw_vector as sv
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.ops.sw_vector_pallas import sw_score_batch_pallas

    rng = np.random.default_rng(11)
    B, G, R = 16, 96, 32
    genome = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    row0 = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    read = np.full((B, R), sv.READ_PAD, np.int8)
    for b in range(B):
        L = int(rng.integers(10, R + 1))
        s = int(rng.integers(0, G - L))
        read[b, :L] = genome[b, s:s + L]
    p = SWParams.colour_space()
    ref = np.asarray(sv.sw_score_batch(
        jnp.asarray(genome), jnp.asarray(read), p, jnp.asarray(row0)))
    pal = np.asarray(sw_score_batch_pallas(
        jnp.asarray(genome), jnp.asarray(read), p,
        genome_row0=jnp.asarray(row0), interpret=True))
    assert np.array_equal(ref, pal)


def test_engine_dispatch_identical():
    """sw_score_engine routes to bit-identical formulations; the mapper's
    engine choice can never change output."""
    import jax.numpy as jnp
    import numpy as np

    from shrimp_tpu.ops import sw_vector as sv
    from shrimp_tpu.ops.params import SWParams

    rng = np.random.default_rng(3)
    B, G, R = 8, 80, 24
    genome = rng.integers(0, 4, size=(B, G)).astype(np.int8)
    read = rng.integers(0, 4, size=(B, R)).astype(np.int8)
    p = SWParams.letter_space()
    outs = [np.asarray(sv.sw_score_engine(
        jnp.asarray(genome), jnp.asarray(read), p, engine=e))
        for e in sv.PASS1_ENGINES]
    for o in outs[1:]:
        assert np.array_equal(outs[0], o)


def test_mapper_engine_invariance():
    """Mapper output is identical under forced pass-1 engines (the
    auto-tune choice is a pure perf knob)."""
    import numpy as np

    from shrimp_tpu import dna
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx
    from shrimp_tpu.pipeline.mapper import Mapper
    from shrimp_tpu.pipeline.options import MapperConfig

    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 20000).astype(np.int8)
    idx = gindex.build_index([fastx.Contig(name="c1", codes=genome)])
    reads = []
    for i in range(24):
        p = int(rng.integers(0, len(genome) - 50))
        r = genome[p:p + 50].copy()
        for _ in range(int(rng.integers(0, 4))):
            q = int(rng.integers(0, 50))
            r[q] = (r[q] + int(rng.integers(1, 4))) % 4
        if rng.random() < 0.5:
            r = dna.reverse_complement(r)
        reads.append((f"r{i:03d}", dna.decode(r), "I" * 50))

    sams = []
    for eng in ("scan", "rows"):
        m = Mapper(idx, MapperConfig(qual_delta=64, pass1_engine=eng))
        res = m.map_batch(reads)
        sams.append([rec.line() for e, hits in res
                     for rec in m.sam_records(e, hits)])
    assert sams[0] == sams[1]

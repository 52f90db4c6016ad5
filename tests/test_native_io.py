"""Native C record indexer vs the Python parser."""

import gzip
import os

from shrimp_tpu import native
from shrimp_tpu.io import fastx

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def parse_python(path, fastq):
    from shrimp_tpu.io.fastx import ReadRecord, _open_maybe_gz
    # force the general parser by round-tripping through gzip
    import tempfile
    raw = open(path, "rb").read()
    with tempfile.NamedTemporaryFile(suffix=".gz", delete=False) as tf:
        tf.write(gzip.compress(raw))
        gz = tf.name
    try:
        return list(fastx.iter_reads(gz, fastq=fastq))
    finally:
        os.unlink(gz)


def test_native_builds():
    assert native.available(), "native toolchain expected in this image"


def test_fastq_matches_python():
    path = os.path.join(GOLDEN, "golden_reads.fq")
    nat = list(fastx.iter_reads(path, fastq=True))
    ref = parse_python(path, True)
    assert len(nat) == len(ref) == 200
    for a, b in zip(nat, ref):
        assert (a.name, a.seq, a.qual) == (b.name, b.seq, b.qual)


def test_cs_fastq_matches_python():
    path = os.path.join(GOLDEN, "golden_reads_cs.fq")
    nat = list(fastx.iter_reads(path, fastq=True))
    ref = parse_python(path, True)
    for a, b in zip(nat, ref):
        assert (a.name, a.seq, a.qual) == (b.name, b.seq, b.qual)


def test_fasta_matches_python():
    path = os.path.join(GOLDEN, "golden_genome.fa")
    nat = list(fastx.iter_reads(path, fastq=False))
    ref = parse_python(path, False)
    assert len(nat) == len(ref) == 2
    for a, b in zip(nat, ref):
        assert (a.name, a.seq) == (b.name, b.seq)


def test_native_index_build_matches_numpy():
    """The native counting-sort CSR build (native/index_native.c) must
    produce byte-identical offsets/positions to the NumPy fallback."""
    import numpy as np

    import shrimp_tpu.native as nm
    from shrimp_tpu import index as gindex
    from shrimp_tpu.io import fastx

    if nm.load_index() is None:
        import pytest
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(42)
    L = 200_000
    genome = rng.integers(0, 4, size=L).astype(np.int8)
    genome[rng.integers(0, L, 300)] = 15           # N runs
    contigs = [fastx.Contig(name="a", codes=genome[:90_000]),
               fastx.Contig(name="b", codes=genome[90_000:])]
    for cs in (False, True):
        idx_nat = gindex.build_index(contigs, colour_space=cs)
        saved = nm._IDX_LIB, nm._IDX_TRIED
        nm._IDX_LIB, nm._IDX_TRIED = None, True    # force NumPy path
        try:
            idx_py = gindex.build_index(contigs, colour_space=cs)
        finally:
            nm._IDX_LIB, nm._IDX_TRIED = saved
        for sn in range(len(idx_nat.offsets)):
            assert np.array_equal(idx_nat.offsets[sn], idx_py.offsets[sn])
            assert np.array_equal(idx_nat.positions[sn],
                                  idx_py.positions[sn])

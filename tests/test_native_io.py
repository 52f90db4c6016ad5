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

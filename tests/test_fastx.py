import gzip

from shrimp_tpu.io import fastx


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">r1 desc\nACGT\nACGT\n>r2\nTTTT\n")
    recs = list(fastx.iter_reads(str(p)))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].seq == "ACGTACGT"
    assert recs[1].qual is None


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2\nGG\n+r2\n!!\n")
    recs = list(fastx.iter_reads(str(p)))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].qual == "IIII"
    assert recs[1].seq == "GG" and recs[1].qual == "!!"


def test_autodetect(tmp_path):
    fq = tmp_path / "a.fq"
    fq.write_text("@r\nAC\n+\nII\n")
    fa = tmp_path / "a.fa"
    fa.write_text(">r\nAC\n")
    assert fastx.detect_fastq(str(fq)) is True
    assert fastx.detect_fastq(str(fa)) is False


def test_gzip_input(tmp_path):
    p = tmp_path / "x.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">r1\nACGTA\n")
    recs = list(fastx.iter_reads(str(p)))
    assert recs[0].seq == "ACGTA"


def test_colour_space_detection():
    r = fastx.ReadRecord(name="x", seq="T0123")
    assert r.is_colour_space()
    r2 = fastx.ReadRecord(name="x", seq="ACGT")
    assert not r2.is_colour_space()


def test_read_batches(tmp_path):
    p = tmp_path / "m.fa"
    p.write_text("".join(f">r{i}\nAC\n" for i in range(7)))
    batches = list(fastx.read_batches(str(p), 3))
    assert [len(b) for b in batches] == [3, 3, 1]


def test_reference_fixture_pairs20():
    # the reference's only checked-in data fixture (tests/pairs20.fq)
    recs = list(fastx.iter_reads("/root/reference/tests/pairs20.fq"))
    assert len(recs) == 20
    assert all(r.is_colour_space() for r in recs)
    assert all(r.qual is not None and len(r.qual) == len(r.seq) - 1 for r in recs)

"""Two-plane pass-1 device gather (genomes past the int32 dynamic-slice
offset ceiling, mapper._p1_gather_score_ls_2pl).

Real hg18-scale genomes cannot run in CI, so the plane-split constants
are shrunk to force a toy genome through the split path; output must be
byte-identical to the host-gather path (which is itself golden-verified
against the reference binary)."""

import numpy as np
import pytest

from shrimp_tpu import dna
from shrimp_tpu.io import fastx
from shrimp_tpu import index as gindex
from shrimp_tpu import seeds as seedmod
from shrimp_tpu.pipeline import mapper as M
from shrimp_tpu.pipeline.options import MapperConfig


def _mk(monkeypatch=None):
    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, 9000).astype(np.int8)
    contigs = [fastx.Contig(name="c1", codes=g[:5000]),
               fastx.Contig(name="c2", codes=g[5000:])]
    idx = gindex.build_index(contigs, seedmod.make_seed_set(None))
    reads = []
    for i in range(48):
        p = int(rng.integers(0, 9000 - 60))
        src = g[p:p + 50].copy()
        q = int(rng.integers(0, 50))
        src[q] = (src[q] + 1) % 4
        if i % 2:
            src = dna.reverse_complement(src)
        reads.append((f"r{i}", dna.decode(src), None))
    return idx, reads


def _map_all(idx, reads, **cfg_kw):
    m = M.Mapper(idx, MapperConfig(**cfg_kw))
    out = []
    for e, hits in m.map_batch(reads):
        for h in hits:
            out.append((e.name, h.cn, h.gen_st, h.g_off, h.score_full,
                        h.genome_start, h.read_start, h.mqv))
    return out, m


def test_split_plane_matches_host_gather(monkeypatch):
    idx, reads = _mk()
    ref, m0 = _map_all(idx, reads, device_pass1_gather=False)
    assert ref, "toy corpus produced no hits"

    # shrink the plane constants so the 9 kbp genome takes the 2-plane
    # path (plane A = [0, 4096+256), plane B = [4096, end) + 256 pad)
    monkeypatch.setattr(M, "PASS1_PLANE_PAD", 256)
    monkeypatch.setattr(M, "PASS1_PLANE_SPLIT", 4096)
    monkeypatch.setattr(M, "PASS1_PLANE_SINGLE_MAX", 6000)
    got, m1 = _map_all(idx, reads, device_pass1_gather=True)
    assert m1._genome_dev is not None and isinstance(m1._genome_dev, tuple)
    assert got == ref


def test_single_plane_forced_device(monkeypatch):
    # same toy corpus through the (shrunk) single-plane device path
    idx, reads = _mk()
    ref, _ = _map_all(idx, reads, device_pass1_gather=False)
    monkeypatch.setattr(M, "PASS1_PLANE_PAD", 256)
    got, m1 = _map_all(idx, reads, device_pass1_gather=True)
    assert not isinstance(m1._genome_dev, tuple)
    assert got == ref


def test_cs_device_gather_matches_host():
    """CS fused device window gather (_p1_gather_score_cs) vs the
    host-gathered path — bit-identical hits on a toy CS corpus."""
    from shrimp_tpu.ops.params import SWParams
    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, 6000).astype(np.int8)
    contigs = [fastx.Contig(name="c1", codes=g)]
    idx = gindex.build_index(contigs, seedmod.make_seed_set(None),
                             colour_space=True)
    reads = []
    for i in range(32):
        p = int(rng.integers(0, 6000 - 60))
        letters = g[p:p + 50].astype(np.int64).copy()
        q = int(rng.integers(0, 50))
        letters[q] = (letters[q] + 1) % 4
        last = 3
        cs = ["T"]
        for b in letters:
            cs.append(str(int(b) ^ last))
            last = int(b)
        reads.append((f"c{i}", "".join(cs), "I" * 50))

    def run(**kw):
        m = M.Mapper(idx, MapperConfig(colour_space=True,
                                       params=SWParams.colour_space(),
                                       qual_delta=33, **kw))
        out = []
        for e, hits in m.map_batch(reads):
            for h in hits:
                out.append((e.name, h.cn, h.gen_st, h.g_off, h.score_full,
                            h.genome_start, h.mqv, h.qralign))
        return out, m

    ref, _ = run(device_pass1_gather=False)
    assert ref
    got, m1 = run(device_pass1_gather=True)
    assert isinstance(m1._genome_dev, tuple)
    assert got == ref

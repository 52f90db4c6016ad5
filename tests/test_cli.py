"""gmapper CLI surface tests: parity with goldens through the command line,
index save/load round trip, and option handling."""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_cli(args, **kw):
    from cli_helper import run_gmapper
    return run_gmapper(args,
                       cwd=os.path.dirname(os.path.dirname(__file__)), **kw)


def test_cli_subprocess_smoke():
    """The one true-subprocess CLI test: the module entry point, import
    side effects, and exit code survive outside the test process (all
    other CLI tests run in-process for speed — see cli_helper.py)."""
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "shrimp_tpu.gmapper", "-Q",
         os.path.join(GOLDEN, "golden_reads.fq"),
         os.path.join(GOLDEN, "golden_genome.fa")],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    assert body(r.stdout) == golden_body("golden_unpaired.sam")


def body(sam_text):
    return [l for l in sam_text.splitlines() if l and not l.startswith("@")]


def golden_body(name):
    with open(os.path.join(GOLDEN, name)) as fh:
        return [l.rstrip("\n") for l in fh if not l.startswith("@")]


def test_cli_ls_unpaired_parity():
    r = run_cli(["--mode", "ls", "-Q",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_unpaired.sam")


def test_cli_cs_paired_parity():
    r = run_cli(["--mode", "cs", "-Q", "-p", "opp-in",
                 os.path.join(GOLDEN, "pairs_cs_opp-in.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_cs_opp-in.sam")


def test_cli_save_load_roundtrip(tmp_path):
    prefix = str(tmp_path / "idx")
    r = run_cli(["-S", prefix, os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    r = run_cli(["-L", prefix, "-Q", os.path.join(GOLDEN, "golden_reads.fq")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_unpaired.sam")


def test_cli_rejects_unknown_option():
    r = run_cli(["--no-such-option", "x.fa", "y.fa"])
    assert r.returncode != 0


def test_cli_rejects_malformed_paired_options():
    r = run_cli(["--paired-options", "z", "x.fa", "y.fa"])
    assert r.returncode != 0


def test_cli_help():
    r = run_cli(["-?"])
    assert r.returncode == 1   # usage() exits 1 (gmapper.c:1246)
    assert "usage" in r.stderr


def test_cli_mmap_roundtrip(tmp_path):
    prefix = str(tmp_path / "shm")
    r = run_cli(["--save-mmap", prefix,
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    r = run_cli(["--load-mmap", prefix, "-Q",
                 os.path.join(GOLDEN, "mini_reads.fq")])
    assert r.returncode == 0, r.stderr
    assert len(body(r.stdout)) == 40


def test_cli_genome_shards_unpaired_parity():
    """--genome-shards N (MeshMapper) emits the same SAM body as the
    single-index run — the reference shard-invariance on the mesh."""
    r = run_cli(["-Q", "--genome-shards", "2",
                 os.path.join(GOLDEN, "golden_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_unpaired.sam")


def test_cli_genome_shards_paired_parity():
    """--genome-shards N with -p (MeshPairedMapper): per-shard paired
    funnels + Part-2c psum recombination == the reference paired SAM."""
    r = run_cli(["-Q", "-p", "opp-in", "--genome-shards", "2",
                 os.path.join(GOLDEN, "golden_pairs.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_paired.sam")


def test_cli_genome_shards_cs_parity():
    """Colour-space mapping across genome shards on the mesh."""
    r = run_cli(["--mode", "cs", "-Q", "--genome-shards", "2",
                 os.path.join(GOLDEN, "golden_reads_cs.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_cs.sam")


def test_cli_genome_shards_cs_paired_parity():
    """Colour-space paired mapping across genome shards on the mesh."""
    r = run_cli(["--mode", "cs", "-Q", "-p", "opp-in",
                 "--genome-shards", "2",
                 os.path.join(GOLDEN, "pairs_cs_opp-in.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_cs_opp-in.sam")


def test_cli_mode_gated_options():
    """Mode-specific option tables (gmapper-defaults.h:161-174): LS
    rejects -v/-x/--bfast, CS rejects --trim-illumina."""
    G = GOLDEN
    ls_args = [os.path.join(G, "golden_reads.fq"),
               os.path.join(G, "golden_genome.fa")]
    for bad in (["-v", "60%"], ["-x", "-10"], ["--bfast"]):
        r = run_cli(["--mode", "ls", "-Q"] + bad + ls_args)
        assert r.returncode != 0, bad
    r = run_cli(["--mode", "cs", "-Q", "--trim-illumina",
                 os.path.join(G, "golden_reads_cs.fq"),
                 os.path.join(G, "golden_genome.fa")])
    assert r.returncode != 0
    # CS -v still works
    r = run_cli(["--mode", "cs", "-Q", "-v", "60%",
                 os.path.join(G, "golden_reads_cs.fq"),
                 os.path.join(G, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr


def test_cli_threads_deterministic():
    """-N 4 (batch worker pool) must emit byte-identical SAM to -N 1
    (ordered reassembly, like the reference's chunk-id output heap)."""
    args = ["-Q", os.path.join(GOLDEN, "golden_reads.fq"),
            os.path.join(GOLDEN, "golden_genome.fa"), "-K", "37"]
    r1 = run_cli(args + ["-N", "1"])
    r4 = run_cli(args + ["-N", "4"])
    assert r1.returncode == 0 and r4.returncode == 0
    assert body(r1.stdout) == body(r4.stdout)
    assert body(r1.stdout) == golden_body("golden_unpaired.sam")


def test_cli_engine_forced_rows_byte_exact():
    """SHRIMP_TPU_PASS1=rows through the CLI: engine choice can never
    change output."""
    os.environ["SHRIMP_TPU_PASS1"] = "rows"
    try:
        r = run_cli(["-Q", os.path.join(GOLDEN, "golden_reads.fq"),
                     os.path.join(GOLDEN, "golden_genome.fa")])
    finally:
        del os.environ["SHRIMP_TPU_PASS1"]
    assert r.returncode == 0, r.stderr
    assert body(r.stdout) == golden_body("golden_unpaired.sam")

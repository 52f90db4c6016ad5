"""Multi-round option-set machinery (--unpaired-options strings)."""

import os
import subprocess
import sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
ROOT = os.path.dirname(os.path.dirname(__file__))
DEFAULTS = ("0;true/true,true,true/true,false,2,55%/true,50%,90%,2,false,30"
            "/50%,false,false,10/0")


def run_cli(args):
    from cli_helper import run_gmapper
    return run_gmapper(args, cwd=ROOT)


def body(stdout):
    return [l for l in stdout.splitlines() if not l.startswith("@")]


def test_parser_defaults_roundtrip():
    from shrimp_tpu.pipeline.options import (MapperConfig,
                                             parse_read_mapping_options)
    parsed = parse_read_mapping_options(DEFAULTS.split(";", 1)[1])
    built = MapperConfig(qual_delta=64).unpaired_options()[0]
    assert parsed.pass1.threshold == built.pass1.threshold
    assert parsed.pass2.num_outputs == built.pass2.num_outputs
    assert parsed.hit_list.threshold == built.hit_list.threshold
    assert parsed.pass2.stop_count == 0


def test_defaults_as_string_matches_defaults():
    base = run_cli(["--mode", "ls", "-Q",
                    os.path.join(GOLDEN, "mini_reads.fq"),
                    os.path.join(GOLDEN, "golden_genome.fa")])
    with_str = run_cli(["--mode", "ls", "-Q",
                        "--unpaired-options", DEFAULTS,
                        os.path.join(GOLDEN, "mini_reads.fq"),
                        os.path.join(GOLDEN, "golden_genome.fa")])
    assert body(base.stdout) == body(with_str.stdout)


def test_two_round_fallthrough():
    strict = ("0;true/true,true,true/true,false,2,55%/true,80%,90%,2,false,"
              "30/80%,false,false,10/1,80%")
    r = run_cli(["--mode", "ls", "-Q",
                 "--unpaired-options", strict,
                 "--unpaired-options", DEFAULTS,
                 os.path.join(GOLDEN, "mini_reads.fq"),
                 os.path.join(GOLDEN, "golden_genome.fa")])
    assert r.returncode == 0, r.stderr
    assert len(body(r.stdout)) >= 40

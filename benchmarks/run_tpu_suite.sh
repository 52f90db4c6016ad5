#!/bin/bash
# One-shot TPU measurement suite (run when the tunnel is up, from /root/repo):
#   bash benchmarks/run_tpu_suite.sh [outdir]
# Captures: per-kernel cells/s (scan/rows/pallas + CS planes), the 1 Gbp
# headline bench, the 3.1 Gbp hg18-scale bench, per-mode benches, and CLI
# warm-start latency.
set -x
OUT=${1:-/tmp/tpu_suite_$(date +%H%M)}
mkdir -p "$OUT"
cd /root/repo

python benchmarks/bench_kernels.py 2>&1 | tee "$OUT/kernels.txt"
python bench.py 2>&1 | tee "$OUT/bench_1g.txt"
SHRIMP_BENCH_GBP=3.1 python bench.py 2>&1 | tee "$OUT/bench_3g1.txt"
python benchmarks/bench_grid.py paired 2>&1 | tee "$OUT/paired_1g.txt"
python benchmarks/bench_grid.py cs 2>&1 | tee "$OUT/cs_1g.txt"
python benchmarks/bench_modes.py 2>&1 | tee "$OUT/modes.txt" || true

# CLI warm-start: second invocation should start mapping in seconds
G=tests/golden
time python -m shrimp_tpu.gmapper -Q $G/golden_reads.fq $G/golden_genome.fa > /dev/null 2> "$OUT/cli_cold.txt"
/usr/bin/time -v python -m shrimp_tpu.gmapper -Q $G/golden_reads.fq $G/golden_genome.fa > /dev/null 2> "$OUT/cli_warm.txt" || \
  { time python -m shrimp_tpu.gmapper -Q $G/golden_reads.fq $G/golden_genome.fa > /dev/null ; } 2> "$OUT/cli_warm.txt"
echo done; ls -la "$OUT"

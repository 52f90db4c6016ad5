#!/bin/bash
# Differential flag fuzzing: reference gmapper vs shrimp_tpu.gmapper on the
# golden corpora (PARITY.md records the per-round results; rounds 6-7 case
# matrix below).  Requires the reference ASAN build at /tmp/refbuild (see
# tests/golden/gen_golden.sh) and runs from the repo root:
#     bash tests/difffuzz.sh
ASAN=$(gcc -print-file-name=libasan.so)
G=tests/golden
run_ref() { local m=$1; shift
  ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD=$ASAN /tmp/refbuild/bin/gmapper-$m -N 1 "$@" 2>/dev/null | grep -v '^@'; }
run_us() { local m=$1; shift
  JAX_PLATFORMS=cpu python -m shrimp_tpu.gmapper --mode $m "$@" 2>/dev/null | grep -v '^@'; }
i=0; fail=0
while read -r m flags; do
  [ -z "$m" ] && continue
  i=$((i+1))
  if [ "$m" = "cs" ]; then RD=$G/golden_reads_cs.fq; else RD=$G/golden_reads.fq; fi
  case "$flags" in *"-p "*) if [ "$m" = "cs" ]; then RD=$G/pairs_cs_opp-in.fq; else RD=$G/golden_pairs.fq; fi;; esac
  ref=$(run_ref $m $flags -Q $RD $G/golden_genome.fa)
  us=$(run_us $m $flags -Q $RD $G/golden_genome.fa)
  if [ "$ref" = "$us" ]; then echo "OK   case$i [$m $flags]"
  else echo "DIFF case$i [$m $flags]"; fail=1; fi
done <<'CASES'
ls 
ls -m 12 -i -20 -g -40 -q -40
ls -w 160%
ls -r 70% -h 60%
ls -U
ls -o 3
ls -p opp-in -I 50,450
ls -p opp-in -n 3
ls -p col-fw -I 0,600
ls -p opp-out -I 0,600
ls -p col-bw -I 0,600
ls -s 111110011111
ls -H
ls -w 120% -o 2 -m 11 -e -5
ls --shrimp-format
ls --shrimp-format -R
ls --shrimp-format -P
ls --sam-unaligned
ls --single-best-mapping
ls --all-contigs
ls -o 1 --strata
ls --local
ls --global
ls -a 4
ls -e -9 -f -2
ls -Z
ls --max-alignments 2
ls -p opp-in --strata
cs 
cs -p opp-in -I 0,500
cs --bfast
cs --shrimp-format -R
cs -U
cs -s 1111001111,1110110111
cs -v 60%
CASES
exit $fail

#!/bin/bash
# Differential fuzz round 9: flags never exercised in rounds 1-8
# (-V -C -F -t, taboo len, insert-size-dist, no-improper-mappings,
# longest-read, qv-offset, trim-front/end, split -1/-2 pair files, -n 1).
# Run from the repo root with the reference ASAN build at /tmp/refbuild.
ASAN=$(gcc -print-file-name=libasan.so)
G=tests/golden
run_ref() { local m=$1; shift
  ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD=$ASAN /tmp/refbuild/bin/gmapper-$m -N 1 "$@" 2>/dev/null | grep -v '^@'; }
run_us() { local m=$1; shift
  PYTHONPATH= JAX_PLATFORMS=cpu python -m shrimp_tpu.gmapper --mode $m "$@" 2>/dev/null | grep -v '^@'; }
# split the interleaved golden pairs into -1/-2 files once
if [ ! -f /tmp/fuzz9_r1.fq ]; then
  awk 'NR%8<4' $G/golden_pairs.fq > /tmp/fuzz9_r1.fq
  awk 'NR%8>=4' $G/golden_pairs.fq > /tmp/fuzz9_r2.fq
fi
i=0; fail=0
while read -r m flags; do
  [ -z "$m" ] && continue
  i=$((i+1))
  if [ "$m" = "cs" ]; then RD=$G/golden_reads_cs.fq; else RD=$G/golden_reads.fq; fi
  case "$flags" in *"-p "*) if [ "$m" = "cs" ]; then RD=$G/pairs_cs_opp-in.fq; else RD=$G/golden_pairs.fq; fi;; esac
  case "$flags" in *"-1 "*) RD="";; esac
  ref=$(run_ref $m $flags ${RD:+-Q $RD} $G/golden_genome.fa)
  us=$(run_us $m $flags ${RD:+-Q $RD} $G/golden_genome.fa)
  if [ "$ref" = "$us" ]; then echo "OK   case$i [$m $flags]"
  else echo "DIFF case$i [$m $flags]"; fail=1; fi
done <<'CASES'
ls -V
ls -C
ls -F
ls -t
ls -n 1
ls --indel-taboo-len 3
ls --qv-offset 33
ls --longest-read 500
ls --trim-front 4 --trim-end 3
ls -p opp-in --insert-size-dist 250,30
ls -p opp-in --no-improper-mappings
ls -p opp-in -Q -1 /tmp/fuzz9_r1.fq -2 /tmp/fuzz9_r2.fq
ls -p opp-in --half-paired
cs -C
cs -t
cs --qv-offset 40
cs -V
cs -p opp-in --insert-size-dist 250,30
CASES
exit $fail

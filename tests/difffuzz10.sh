#!/bin/bash
# Differential fuzz round 10: RANDOMIZED flag combinations (seeded).
# Rounds 1-9 were hand-picked matrices; this samples 2-4 flags per case
# from a pool to catch interactions. Run from the repo root with the
# reference ASAN build at /tmp/refbuild.
#
#   bash tests/difffuzz10.sh [n_cases] [seed]
#
# Known reference UB excluded from the pool (PARITY.md): --trim-first
# (heap overflow), --paired-options fall-through, negative -r/-h.
N=${1:-20}
SEED=${2:-1234}
ASAN=$(gcc -print-file-name=libasan.so)
G=tests/golden
run_ref() { local m=$1; shift
  ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD=$ASAN /tmp/refbuild/bin/gmapper-$m -N 1 "$@" 2>/dev/null | grep -v '^@'; }
run_us() { local m=$1; shift
  PYTHONPATH= JAX_PLATFORMS=cpu python -m shrimp_tpu.gmapper --mode $m "$@" 2>/dev/null | grep -v '^@'; }

# flag pool: "flag args" strings; SAFE for both ls and cs unless prefixed
# ls: / cs: . Paired-only flags prefixed p:.
POOL=(
  "-o 3" "-o 1" "--max-alignments 2" "-w 130%" "-w 160%" "-n 1" "-n 2"
  "-l 80%" "-a 4" "-a -1" "-m 12" "-i -20" "-g -40 -q -40" "-e -5 -f -5"
  "-r 60%" "-h 60%" "-h 1000" "--strata" "--single-best-mapping"
  "--all-contigs" "--no-mapping-qualities" "-U" "--local" "-C" "-F"
  "-t" "-T" "-V" "-Z" "-H" "-D" "-X" "-Y" "--sam-unaligned"
  "--min-avg-qv 5" "--qv-offset 64" "--longest-read 200"
  "--trim-front 2" "--trim-end 2" "--indel-taboo-len 2"
  "ls:--trim-illumina" "cs:-x -18" "cs:-v 40%" "cs:--bfast"
  "p:--no-improper-mappings" "p:--half-paired" "p:--insert-size-dist 200,40"
  "p:-I 0,400" "p:-n 3"
)

i=0; fail=0
RANDOM=$SEED
while [ $i -lt $N ]; do
  i=$((i+1))
  if [ $((RANDOM % 3)) -eq 0 ]; then m=cs; else m=ls; fi
  if [ $((RANDOM % 4)) -eq 0 ]; then paired=1; else paired=0; fi
  nf=$((2 + RANDOM % 3))
  flags=""
  for ((k=0; k<nf; k++)); do
    f="${POOL[$((RANDOM % ${#POOL[@]}))]}"
    case "$f" in
      ls:*) [ "$m" = ls ] || continue; f="${f#ls:}";;
      cs:*) [ "$m" = cs ] || continue; f="${f#cs:}";;
      p:*)  [ "$paired" = 1 ] || continue; f="${f#p:}";;
    esac
    case " $flags " in *" $f "*) continue;; esac
    # -U conflicts with --local/--global gating in both (same policy)
    flags="$flags $f"
  done
  if [ "$paired" = 1 ]; then
    pm="-p opp-in"
    if [ "$m" = cs ]; then RD=$G/pairs_cs_opp-in.fq; else RD=$G/golden_pairs.fq; fi
  else
    pm=""
    if [ "$m" = cs ]; then RD=$G/golden_reads_cs.fq; else RD=$G/golden_reads.fq; fi
  fi
  ref=$(run_ref $m $pm $flags -Q $RD $G/golden_genome.fa)
  rc_ref=$?
  us=$(run_us $m $pm $flags -Q $RD $G/golden_genome.fa)
  rc_us=$?
  if [ "$ref" = "$us" ] && [ "$rc_ref" = "$rc_us" ]; then
    echo "OK   case$i [$m $pm $flags] rc=$rc_ref"
  else
    echo "DIFF case$i [$m $pm $flags] rc_ref=$rc_ref rc_us=$rc_us"
    fail=1
  fi
done
exit $fail

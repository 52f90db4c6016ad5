#!/bin/bash
# Regenerate the golden corpus with the reference SHRiMP2 binary.
# Usage: ./gen_golden.sh /path/to/reference-checkout
set -e
REF=${1:-/root/reference}
WORK=$(mktemp -d)
cp -r "$REF" "$WORK/refbuild"
chmod -R u+w "$WORK/refbuild"
(cd "$WORK/refbuild" && make CXXFLAGS="-O1 -g -fsanitize=address -fno-omit-frame-pointer -fopenmp -mmmx -msse -msse2 -D__STDC_FORMAT_MACROS -D__STDC_LIMIT_MACROS -DGIT_VERSION=x" LDFLAGS="-lm -lz -lstdc++ -lrt -fopenmp -fsanitize=address" bin/gmapper)
python3 "$(dirname "$0")/gen_golden_data.py" "$(dirname "$0")"
LD_PRELOAD=$(gcc -print-file-name=libasan.so) stdbuf -o0 \
  "$WORK/refbuild/bin/gmapper-ls" -Q "$(dirname "$0")/golden_reads.fq" \
  "$(dirname "$0")/golden_genome.fa" -N 1 \
  > "$(dirname "$0")/golden_unpaired.sam"
rm -rf "$WORK"

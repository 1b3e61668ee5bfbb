#!/bin/bash
# Build the reference C++ kernels (out-of-tree, for golden fixture generation
# only — see tools/make_golden.py).  Requires /root/reference to be mounted.
set -euo pipefail
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/refbuild}
HERE=$(cd "$(dirname "$0")" && pwd)
mkdir -p "$OUT/stub"
touch "$OUT/stub/minimap.h" "$OUT/stub/mmpriv.h" "$OUT/stub/kalloc.h"

g++ -O2 -march=native -I"$REF/benchmarks/bsw" \
    "$HERE/ref_drivers/bsw_gold.cpp" "$REF/benchmarks/bsw/bandedSWA.cpp" \
    -fopenmp -o "$OUT/bsw_gold"

g++ -O2 -I"$OUT/stub" -I"$REF/benchmarks/chain/src" \
    "$HERE/ref_drivers/chain_gold.cpp" "$REF/benchmarks/chain/src/host_kernel.cpp" \
    -fopenmp -o "$OUT/chain_gold"

echo "built $OUT/bsw_gold $OUT/chain_gold"

g++ -O2 -DHAVE_CONFIG_H -include "$HERE/ref_drivers/abea_stub/config.h" \
    -I"$HERE/ref_drivers/abea_stub" -I"$REF/benchmarks/abea/src" \
    "$HERE/ref_drivers/abea_gold.cpp" "$REF/benchmarks/abea/src/align.c" \
    "$REF/benchmarks/abea/src/events.c" -o "$OUT/abea_gold" -lm
echo "built $OUT/abea_gold"

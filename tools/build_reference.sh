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

# Float-mode ABEA: the reference's own GPU kernel is built with
# ALIGN_KERNEL_FLOAT (f5cmisc.cuh:23), i.e. f32 transition constants and
# pure-f32 score adds — the semantics a TPU kernel can actually implement.
# align.c hardcodes double lp_* (align.c:196-205) and mixed-precision adds
# (align.c:371: float = float + double + float); -Ddouble=float turns the
# CPU kernel into the accelerator-mode build so we can cross-check our
# kernel bit-for-bit against it.
g++ -O2 -DHAVE_CONFIG_H \
    -include "$HERE/ref_drivers/abea_stub/config.h" \
    -I"$HERE/ref_drivers/abea_stub" -I"$REF/benchmarks/abea/src" \
    -c "$HERE/ref_drivers/align_f32_tu.cpp" -o "$OUT/align_f32.o"
g++ -O2 -DHAVE_CONFIG_H -include "$HERE/ref_drivers/abea_stub/config.h" \
    -I"$HERE/ref_drivers/abea_stub" -I"$REF/benchmarks/abea/src" \
    "$HERE/ref_drivers/abea_gold.cpp" "$OUT/align_f32.o" \
    "$REF/benchmarks/abea/src/events.c" -o "$OUT/abea_gold_f32" -lm
echo "built $OUT/abea_gold_f32"

g++ -O2 -I"$REF/benchmarks/kmer-cnt" -I"$REF/benchmarks/kmer-cnt/libcuckoo" \
    "$HERE/ref_drivers/kmer_gold.cpp" \
    "$REF/benchmarks/kmer-cnt/sequence.cpp" \
    "$REF/benchmarks/kmer-cnt/sequence_container.cpp" \
    "$REF/benchmarks/kmer-cnt/vertex_index.cpp" \
    -o "$OUT/kmer_gold" -lz -lpthread
echo "built $OUT/kmer_gold"

g++ -O2 -I"$HERE/ref_drivers/dbg_stub" -I"$REF/benchmarks/dbg" \
    "$HERE/ref_drivers/dbg_gold.cpp" -fopenmp -o "$OUT/dbg_gold"
echo "built $OUT/dbg_gold"

# the REAL reference bsw binary (AVX2 vector kernel, the canonical
# run-cpu.sh:30 baseline) — bench.py re-measures it live when present
g++ -DSORT_PAIRS -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 -O3 -std=c++11 \
    -fopenmp -mavx2 \
    "$REF/benchmarks/bsw/main_banded.cpp" \
    "$REF/benchmarks/bsw/bandedSWA.cpp" -o "$OUT/bsw_ref"
echo "built $OUT/bsw_ref"

# the reference pileup benchmark (medaka_counts.c), compiled against a
# minimal self-written htslib-compatible shim (htslib submodule is empty;
# tools/ref_drivers/htslib_shim) — PRINT_OUTPUT on for golden diffs
gcc -O2 -DPRINT_OUTPUT -fopenmp \
    -I"$HERE/ref_drivers/htslib_shim" -I"$REF/benchmarks/pileup" \
    "$REF/benchmarks/pileup/medaka_counts.c" \
    "$REF/benchmarks/pileup/medaka_common.c" \
    "$REF/benchmarks/pileup/medaka_bamiter.c" \
    "$HERE/ref_drivers/htslib_shim/sam_shim.c" \
    -o "$OUT/pileup_gold" -lz -lm
echo "built $OUT/pileup_gold"
gcc -O2 -fopenmp \
    -I"$HERE/ref_drivers/htslib_shim" -I"$REF/benchmarks/pileup" \
    "$REF/benchmarks/pileup/medaka_counts.c" \
    "$REF/benchmarks/pileup/medaka_common.c" \
    "$REF/benchmarks/pileup/medaka_bamiter.c" \
    "$HERE/ref_drivers/htslib_shim/sam_shim.c" \
    -o "$OUT/pileup_gold_quiet" -lz -lm
echo "built $OUT/pileup_gold_quiet"

g++ -O2 -DHAVE_CONFIG_H -include "$HERE/ref_drivers/realign_stub/config.h" \
    -I"$HERE/ref_drivers/htslib_shim" -I"$HERE/ref_drivers/realign_stub" \
    -I"$HERE/ref_drivers/abea_stub" -I"$REF/benchmarks/abea/src" \
    "$HERE/ref_drivers/realign_gold.cpp" \
    -o "$OUT/realign_gold" -lm
echo "built $OUT/realign_gold"

# GKL computelikelihoodsboth semantics (the GKL submodule is empty): an
# honest anti-diagonal SIMD float+double-fallback pair-HMM, timed as the
# phmm host baseline and used for the phmm numeric crosscheck
g++ -O3 -march=native -fopenmp-simd \
    "$HERE/ref_drivers/phmm_gold.cpp" -o "$OUT/phmm_gold" -lm
echo "built $OUT/phmm_gold"

# explicit-AVX2 FMA variant (VERDICT r4 #5): the phmm TIMING baseline —
# the scalar-order phmm_gold stays the bit-stable correctness oracle
g++ -O3 -march=native -mavx2 -mfma \
    "$HERE/ref_drivers/phmm_gold_avx2.cpp" -o "$OUT/phmm_gold_avx2" -lm
echo "built $OUT/phmm_gold_avx2"

# spoa semantics (submodule empty): graph-NW + ring fusion + heaviest
# bundle consensus with the oracle/poa.py tie-breaks — the poa host
# baseline; consensus bit-identical to the framework's
g++ -O3 -march=native \
    "$HERE/ref_drivers/poa_gold.cpp" -o "$OUT/poa_gold"
echo "built $OUT/poa_gold"

# explicit-AVX2 variant (VERDICT r4 #5): the poa TIMING baseline —
# consensus bit-identical to poa_gold, row loops 8-wide int32
g++ -O3 -march=native -mavx2 \
    "$HERE/ref_drivers/poa_gold_avx2.cpp" -o "$OUT/poa_gold_avx2"
echo "built $OUT/poa_gold_avx2"

# fmi_gold: in-repo C baseline for the FM-index SMEM passes (bwa-mem2's
# submodule is empty; see tools/ref_drivers/fmi_gold.cpp header)
g++ -O3 -march=native -std=c++17 \
    "$HERE/ref_drivers/fmi_gold.cpp" -o "$OUT/fmi_gold"
echo "built $OUT/fmi_gold"

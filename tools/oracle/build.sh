#!/bin/bash
# Build the golden-vector oracle against the read-only reference checkout.
#
# sw_avx.cpp gets aligned_alloc_shim.h force-included: the reference passes
# aligned_alloc arguments in MSVC order, which corrupts the heap with glibc
# (see docs/PARITY_NOTES.md).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/main/native
# Match the reference CMake flag split: scalar TUs are built with plain
# -O3 (baseline SSE2, no FMA contraction possible); only the AVX TUs get
# -mavx -mavx2 -mfma (reference mgl_pairhmm/CMakeLists.txt:8-9,
# mgl_sw/CMakeLists.txt).
BASE="g++ -O3 -g -std=c++17 -I$REF/mgl_sw -I$REF/mgl_pairhmm"
VEC="$BASE -mavx -mavx2 -mfma"

mkdir -p obj
rm -f obj/*.o
$BASE -c "$REF/mgl_sw/sw.cpp" -o obj/sw.o
$VEC -include aligned_alloc_shim.h -c "$REF/mgl_sw/sw_avx.cpp" -o obj/sw_avx.o
$BASE -c "$REF/mgl_pairhmm/compute_prob_scalar.cc" -o obj/cps.o
$VEC -c "$REF/mgl_pairhmm/compute_prob_avxf.cc" -o obj/cpaf.o
$VEC -c "$REF/mgl_pairhmm/compute_prob_avxd.cc" -o obj/cpad.o
$BASE -c "$REF/mgl_pairhmm/compute_fast_prob.cc" -o obj/cfp.o
$BASE -c "$REF/mgl_pairhmm/pairhmm_common.cc" -o obj/phc.o
$VEC -c oracle_main.cpp -o obj/main.o
$BASE -o oracle obj/*.o -ltbb -ltbbmalloc
echo built: "$(pwd)/oracle"

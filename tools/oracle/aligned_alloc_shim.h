// Force-included when compiling the reference's sw_avx.cpp.
//
// The reference calls aligned_alloc(SIZE, ALIGNMENT) — argument order of
// MSVC's _aligned_malloc — but glibc's aligned_alloc is (ALIGNMENT, SIZE).
// On Linux every sw_avx.cpp allocation therefore returns a ~32-byte buffer
// and the subsequent memsets corrupt the heap (reproducible crash for any
// query >= 8).  This shim swaps the arguments so we can extract golden
// vectors from the AVX2 kernel.  See docs/PARITY_NOTES.md.
#pragma once
#include <cstdlib>
#include <x86intrin.h>

// The reference also issues *aligned* vector load/store intrinsics on
// addresses that step by 4 bytes per iteration (sw_avx.cpp:161-162, 173,
// 183, ...).  MSVC folds these into alignment-tolerant VEX memory operands;
// gcc emits vmovdqa, which faults.  Map them to the unaligned forms —
// identical semantics, and this is only the golden-vector oracle.
#define _mm256_load_si256 _mm256_loadu_si256
#define _mm256_store_si256 _mm256_storeu_si256

static inline void* mgl_oracle_aligned_alloc(size_t size, size_t /*alignment*/) {
    size_t sz = (size + 63) & ~size_t(63);
    return aligned_alloc(64, sz);
}

#define aligned_alloc(SIZE, ALIGN) mgl_oracle_aligned_alloc((SIZE), (ALIGN))

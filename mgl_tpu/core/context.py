"""Quality/probability context tables for PairHMM.

TPU-native re-derivation of the GATK/Intel-GKL quality context used by the
reference (``/root/reference/src/main/native/mgl_pairhmm/Context.h``):

* ``ph2pr[128]``      — Phred score -> error probability table
  (Context.h:105-107 double, 145-147 float).
* ``jacobian_log``    — Jacobian log-sum correction table, step 1e-4
  (Context.h:42-47).
* ``match_to_match``  — quantized triangular match-continuation probability
  table (Context.h:50-61).
* ``INITIAL_CONSTANT``— anti-underflow scaler, 2^1020 (double) / 2^120 (float)
  (Context.h:109, 149).

The tables are *value-parity critical*: the rebuild's likelihoods must agree
with the reference within 1e-5 in log10 space, and errors compound over ~150
multiplications per read, so each table is generated with the same mixed
float/double arithmetic the reference uses (including its float-rounded
intermediates).  ``tests/test_context.py`` checks these tables bit-for-bit
against a dump from the compiled C++ reference.

Everything here is plain NumPy, computed once at import; the arrays are later
closed over as constants by jitted JAX functions (XLA embeds them).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

MAX_QUAL = 254
MAX_JACOBIAN_TOLERANCE = 8.0
JACOBIAN_LOG_TABLE_STEP = 0.0001
JACOBIAN_LOG_TABLE_INV_STEP = 1.0 / JACOBIAN_LOG_TABLE_STEP
JACOBIAN_LOG_TABLE_SIZE = int(MAX_JACOBIAN_TOLERANCE / JACOBIAN_LOG_TABLE_STEP) + 1

# Tier thresholds (pairhmm_common.h:31, Context.h:111/151).
MIN_ACCEPTED = np.float32(1e-28)

_TRI_SIZE = ((MAX_QUAL + 1) * (MAX_QUAL + 2)) >> 1


def _jacobian_log_table(dtype) -> np.ndarray:
    """jacobianLogTable[k] = log10(1 + 10^(-k*step)), computed in double then
    cast (Context.h:42-47: 'don't bother to optimize with single precision')."""
    k = np.arange(JACOBIAN_LOG_TABLE_SIZE, dtype=np.float64)
    tbl = np.log10(1.0 + np.power(10.0, -k * JACOBIAN_LOG_TABLE_STEP))
    return tbl.astype(dtype)


def _approximate_log10_sum_log10(small, big, table: np.ndarray, dtype):
    """Vectorized approximateLog10SumLog10 (Context.h:67-90) in ``dtype``.

    Inputs must already be ``dtype`` scalars/arrays; the comparison, diff,
    quantization, and final add are all performed in ``dtype`` to match the
    reference's template instantiation.
    """
    small = np.asarray(small, dtype=dtype)
    big = np.asarray(big, dtype=dtype)
    lo = np.minimum(small, big)
    hi = np.maximum(small, big)
    diff = (hi - lo).astype(dtype)
    # fastRound for d > 0: (int)(d + 0.5) — truncation toward zero.
    scaled = (diff * dtype(JACOBIAN_LOG_TABLE_INV_STEP)).astype(dtype)
    ind = np.trunc(scaled + dtype(0.5)).astype(np.int64)
    ind = np.clip(ind, 0, JACOBIAN_LOG_TABLE_SIZE - 1)
    corrected = (hi + table[ind]).astype(dtype)
    return np.where(diff >= dtype(MAX_JACOBIAN_TOLERANCE), hi, corrected)


def _match_to_match_table(dtype) -> np.ndarray:
    """matchToMatchProb triangular table (Context.h:50-61).

    Entry layout: offset(i) + j for j <= i, offset(i) = i*(i+1)/2.
    log10Sum is computed by the *dtype* approximateLog10SumLog10 (the table
    initializer is a ContextBase<NUMBER> static, so the float context builds
    it with float arithmetic); the log1p/pow wrap-up is double, then cast.
    """
    jac = _jacobian_log_table(dtype)
    i = np.arange(MAX_QUAL + 1)
    # all (i, j) pairs with j <= i
    ii, jj = np.tril_indices(MAX_QUAL + 1)
    # arguments are written as -0.1f*i in the C++ (float literals) even for
    # the double context: replicate the float rounding of the inputs.
    a32 = (np.float32(-0.1) * ii.astype(np.float32))
    b32 = (np.float32(-0.1) * jj.astype(np.float32))
    log10_sum = _approximate_log10_sum_log10(
        a32.astype(dtype), b32.astype(dtype), jac, dtype
    ).astype(np.float64)
    with np.errstate(divide="ignore"):  # (0,0) entry -> log1p(-1) -> -inf -> prob 0
        m2m_log10 = np.log1p(-np.minimum(1.0, np.power(10.0, log10_sum))) / math.log(10.0)
    vals = np.power(10.0, m2m_log10).astype(dtype)
    out = np.zeros(_TRI_SIZE, dtype=dtype)
    out[(ii * (ii + 1)) // 2 + jj] = vals
    return out


def _ph2pr_table(dtype) -> np.ndarray:
    """ph2pr[x] = 10^(-x/10) in the context's own precision
    (Context.h:105-107 / 145-147)."""
    x = np.arange(128, dtype=dtype)
    return np.power(dtype(10.0), -(x / dtype(10.0))).astype(dtype)


@dataclasses.dataclass(frozen=True)
class QualityContext:
    """One precision tier's tables (mirrors Context<float> / Context<double>)."""

    dtype: type
    ph2pr: np.ndarray
    match_to_match: np.ndarray
    jacobian_log: np.ndarray
    initial_constant: float
    log10_initial_constant: float

    def set_mm_prob(self, ins_qual, del_qual) -> np.ndarray:
        """Match-continuation probability (Context.h:123-134 / 163-174).

        ``ins_qual``/``del_qual`` are integer arrays already masked to
        ``& 127`` by the caller (compute_prob_scalar.cc:76-77), so the
        MAX_QUAL overflow branch never triggers.
        """
        ins_qual = np.asarray(ins_qual, dtype=np.int64)
        del_qual = np.asarray(del_qual, dtype=np.int64)
        min_q = np.minimum(ins_qual, del_qual)
        max_q = np.maximum(ins_qual, del_qual)
        return self.match_to_match[((max_q * (max_q + 1)) >> 1) + min_q]


import pathlib

_TABLES_NPZ = pathlib.Path(__file__).parent / "_tables" / "context_tables.npz"


def _build(dtype, ic_exp: int) -> QualityContext:
    """Build one precision tier's context.

    If the canonical table dump (generated once from the compiled C++
    reference by ``tools/gen_tables.py`` — bit-exact powf/log10 values) is
    present, it is used; otherwise the tables are recomputed in NumPy, which
    matches to within 1 ulp (powf/log10 libm rounding differences).
    """
    ic = math.ldexp(1.0, ic_exp)
    sfx = "f32" if dtype == np.float32 else "f64"
    if _TABLES_NPZ.exists():
        z = np.load(_TABLES_NPZ)
        ph2pr = z[f"ph2pr_{sfx}"]
        m2m = z[f"m2m_{sfx}"]
        jac = z[f"jac_{sfx}"]
    else:  # pragma: no cover - fallback when the dump isn't committed
        ph2pr = _ph2pr_table(dtype)
        m2m = _match_to_match_table(dtype)
        jac = _jacobian_log_table(dtype)
    return QualityContext(
        dtype=dtype,
        ph2pr=ph2pr,
        match_to_match=m2m,
        jacobian_log=jac,
        initial_constant=dtype(ic),
        log10_initial_constant=dtype(np.log10(dtype(ic))),
    )


# Context<float>: INITIAL_CONSTANT = 2^120 (Context.h:149)
CTX_F32 = _build(np.float32, 120)
# Context<double>: INITIAL_CONSTANT = 2^1020 (Context.h:109)
CTX_F64 = _build(np.float64, 1020)

ONE_THIRD_F32 = np.float32(1.0) / np.float32(3.0)
ONE_THIRD_F64 = 1.0 / 3.0


def get_context(use_double: bool = False) -> QualityContext:
    return CTX_F64 if use_double else CTX_F32


def read_transition_rows(read_q, read_i, read_d, read_c, ctx: QualityContext):
    """Per-row transition/emission vectors for one or more reads.

    Re-derivation of compute_prob_scalar.cc:74-86: given the four quality
    tracks (raw bytes), returns (pMM, pGapM, pMX, pMY, pZZ, distm) with a
    leading zero row (row 0 of the DP has no read base).  Works on any
    leading batch shape; the last axis is the read-length axis.
    """
    q = np.asarray(read_q, dtype=np.uint8) & 127
    i = np.asarray(read_i, dtype=np.uint8) & 127
    d = np.asarray(read_d, dtype=np.uint8) & 127
    c = np.asarray(read_c, dtype=np.uint8) & 127
    one = ctx.dtype(1.0)
    p_mm = ctx.set_mm_prob(i, d)
    p_gapm = (one - ctx.ph2pr[c]).astype(ctx.dtype)
    p_mx = ctx.ph2pr[i]
    p_my = ctx.ph2pr[d]
    p_zz = ctx.ph2pr[c]
    distm = ctx.ph2pr[q]

    def _prepend_zero(a):
        pad = [(0, 0)] * (a.ndim - 1) + [(1, 0)]
        return np.pad(a, pad)

    return tuple(_prepend_zero(v) for v in (p_mm, p_gapm, p_mx, p_my, p_zz, distm))

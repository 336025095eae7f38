"""Quality-context table tests (vs reference Context.h semantics)."""

import math

import numpy as np

from mgl_tpu.core import context as C


def test_table_shapes_and_anchors():
    for ctx in (C.CTX_F32, C.CTX_F64):
        assert ctx.ph2pr.shape == (128,)
        assert ctx.jacobian_log.shape == (C.JACOBIAN_LOG_TABLE_SIZE,)
        assert ctx.match_to_match.shape == (C._TRI_SIZE,)
        # ph2pr[10] = 0.1, ph2pr[0] = 1.0
        assert abs(float(ctx.ph2pr[0]) - 1.0) < 1e-7
        assert abs(float(ctx.ph2pr[10]) - 0.1) < 1e-7
        # jacobian[0] = log10(2)
        assert abs(float(ctx.jacobian_log[0]) - math.log10(2.0)) < 1e-7


def test_initial_constants():
    assert float(C.CTX_F32.initial_constant) == math.ldexp(1.0, 120)
    assert float(C.CTX_F64.initial_constant) == math.ldexp(1.0, 1020)
    assert abs(float(C.CTX_F32.log10_initial_constant) - 120 * math.log10(2)) < 1e-4
    assert abs(float(C.CTX_F64.log10_initial_constant) - 1020 * math.log10(2)) < 1e-4


def test_set_mm_prob_matches_formula():
    # set_mm_prob(10, 10): 1 - 10^(log10(2*0.1)) = 0.8
    v = float(C.CTX_F32.set_mm_prob(np.array(10), np.array(10)))
    assert abs(v - 0.8) < 1e-6
    # symmetric in (i, d)
    a = C.CTX_F32.set_mm_prob(np.array(17), np.array(42))
    b = C.CTX_F32.set_mm_prob(np.array(42), np.array(17))
    assert a == b


def test_numpy_fallback_close_to_canonical():
    """The recomputed tables must stay within 1 ulp of the canonical dump."""
    ph = C._ph2pr_table(np.float32)
    diff = np.abs(ph.astype(np.float64) - C.CTX_F32.ph2pr.astype(np.float64))
    ulp32 = np.spacing(np.abs(C.CTX_F32.ph2pr)).astype(np.float64)
    assert np.all(diff <= ulp32)  # within 1 ulp of the libm-canonical dump
    m2m = C._match_to_match_table(np.float32)
    assert np.array_equal(m2m, C.CTX_F32.match_to_match)

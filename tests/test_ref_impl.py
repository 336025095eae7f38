"""NumPy oracle tests against golden vectors from the compiled C++ reference.

The full SW golden sweep (1972 cases) is exercised by the batched JAX op
tests; here the pure-NumPy oracles are spot-checked on a deterministic
subsample (they are the slow parity anchors, not the product).
"""

import math

import numpy as np
import pytest

from mgl_tpu.core.context import CTX_F32, CTX_F64, MIN_ACCEPTED
from mgl_tpu.core.params import OverhangStrategy, SWParameters
from mgl_tpu.ref_impl import sw_scalar
from mgl_tpu.ref_impl.pairhmm_scalar import compute_likelihoods, compute_score

from conftest import as_u8, kat_read


def test_sw_oracle_subsample_exact(sw_golden):
    rows = sw_golden[::23]  # ~85 cases spread across strategies/params
    for r in rows:
        p = SWParameters.normalized(r["match"], r["mismatch"], r["open"], r["ext"])
        cig, off = sw_scalar.align(
            r["target"].encode(), r["query"].encode(), p,
            OverhangStrategy(r["strategy"]),
        )
        assert cig == r["cigar_scalar"], (r["target"], r["query"], r["strategy"])
        assert off == r["offset_scalar"]


def test_reference_avx_equals_scalar(sw_golden):
    """The reference's own two kernels agree on every golden case, so the
    scalar semantics are the single parity target."""
    for r in sw_golden:
        if r["cigar_avx"] != "-":
            assert r["cigar_avx"] == r["cigar_scalar"]
            assert r["offset_avx"] == r["offset_scalar"]


def test_pairhmm_kat_float_cascade(pairhmm_kat):
    for case in pairhmm_kat[::5] + pairhmm_kat[-1:]:
        read = kat_read(case)
        out = compute_likelihoods([read], [as_u8(case["hap"])])
        assert abs(out[0, 0] - case["expected_log10"]) < 1e-5


def test_pairhmm_kat_double(pairhmm_kat):
    for case in pairhmm_kat[::11]:
        read = kat_read(case)
        out = compute_likelihoods([read], [as_u8(case["hap"])], use_double=True)
        assert abs(out[0, 0] - case["expected_log10"]) < 1e-5


def test_pairhmm_scores_vs_cpp(pairhmm_golden):
    rows = pairhmm_golden[::9]
    for r in rows:
        args = (
            as_u8(r["hap"]), as_u8(r["read"]),
            np.array(r["q"], dtype=np.uint8), np.array(r["i"], dtype=np.uint8),
            np.array(r["d"], dtype=np.uint8), np.array(r["c"], dtype=np.uint8),
        )
        g32 = float.fromhex(r["scalarf"])
        g64 = float.fromhex(r["scalard"])
        s32 = compute_score(*args, ctx=CTX_F32)
        s64 = compute_score(*args, ctx=CTX_F64)
        # rescue decision must agree; non-rescued must be within the log10 contract
        assert (s32 < float(MIN_ACCEPTED)) == (g32 < float(MIN_ACCEPTED))
        if g32 >= float(MIN_ACCEPTED):
            assert abs(math.log10(s32) - math.log10(g32)) < 1e-5
        assert abs(s64 - g64) <= 1e-12 * abs(g64)

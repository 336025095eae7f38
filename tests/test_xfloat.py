"""On-device extended-range rescue tier (ops/xfloat.py) vs the compiled
reference's double kernels (golden scalard/avxd dumps)."""

import math
import os

import numpy as np
import pytest

from mgl_tpu.core.context import CTX_F64, MIN_ACCEPTED

from conftest import as_u8


def _golden_reads_haps(rows):
    reads = [dict(bases=as_u8(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [as_u8(r["hap"]) for r in rows]
    return reads, haps


def test_xf_ops_roundtrip_and_arithmetic():
    """xfloat mul/add agree with f64 over ~600 decades of dynamic range."""
    import jax.numpy as jnp

    from mgl_tpu.ops.xfloat import XF, xf_add, xf_mul, xf_split, xf_to_f64

    rng = np.random.default_rng(0)
    n = 4096
    # magnitudes spanning far beyond f32 range (1e-290 .. 1e290)
    a = rng.uniform(0.5, 2.0, n) * 10.0 ** rng.integers(-290, 290, n)
    b = rng.uniform(0.5, 2.0, n) * 10.0 ** rng.integers(-290, 290, n)
    a[:8] = 0.0  # zeros mixed in
    b[4:12] = 0.0

    xa = XF(*map(jnp.asarray, xf_split(a)))
    xb = XF(*map(jnp.asarray, xf_split(b)))

    # roundtrip keeps the full 48-bit double-float mantissa
    rt = xf_to_f64(*(np.asarray(x) for x in xa))
    nz = a != 0
    assert np.array_equal(rt == 0, a == 0)
    assert np.all(np.abs(rt[nz] / a[nz] - 1) < 2.0 ** -45)

    m = xf_mul(xa, xb)
    s = xf_add(xa, xb)
    got_m = xf_to_f64(*(np.asarray(x) for x in m))
    got_s = xf_to_f64(*(np.asarray(x) for x in s))
    want_m = a * b          # may over/underflow f64: compare where finite
    want_s = a + b
    ok = np.isfinite(want_m) & (want_m != 0)
    assert np.all(np.abs(got_m[ok] / want_m[ok] - 1) < 1e-13)
    ok = want_s != 0
    assert np.all(np.abs(got_s[ok] / want_s[ok] - 1) < 1e-13)
    # f64-underflowed products survive in xfloat (range check): 1e-300*1e-300
    tiny = XF(*map(jnp.asarray, xf_split(np.array([1e-300]))))
    t2 = xf_mul(tiny, tiny)
    assert float(np.asarray(t2.hi)[0]) != 0.0
    assert int(np.asarray(t2.e)[0]) < -1900


def test_xf_rescue_matches_reference_double_kernels(pairhmm_golden):
    """Full golden corpus through the device xfloat tier: log10 within 1e-5
    of the reference's own f64 kernels (scalard and the production avxd),
    with identical underflow-to-zero semantics."""
    from mgl_tpu.ops.xfloat import rescue_scores_xf

    rows = pairhmm_golden
    reads, haps = _golden_reads_haps(rows)
    got = rescue_scores_xf(reads, haps, [(k, k) for k in range(len(rows))])
    for k, r in enumerate(rows):
        want_s = float.fromhex(r["scalard"])
        want_a = float.fromhex(r["avxd"])
        if want_s == 0.0:
            assert got[k] == 0.0, k
            continue
        assert got[k] > 0.0, k
        dl = abs(math.log10(got[k]) - math.log10(want_s))
        da = abs(math.log10(got[k]) - math.log10(want_a))
        assert dl < 1e-5 and da < 1e-5, (k, got[k], want_s, want_a)


def test_xf_banded_kernel_matches_scan_spec(monkeypatch, pairhmm_golden):
    """The banded Pallas xfloat kernel (kernels/pairhmm_xf_pallas.py) on a
    golden rescue slice: same underflow set as the XLA scan spec and
    log10 within 1e-9 (the U/W pre-multiplication only reorders
    rounding), and within the 1e-5 contract of the reference's f64
    kernels."""
    from mgl_tpu.kernels.pairhmm_xf_pallas import rescue_scores_xf_banded
    from mgl_tpu.ops.xfloat import rescue_scores_xf

    monkeypatch.setenv("MGL_TPU_PALLAS_INTERPRET", "1")
    rows = pairhmm_golden[:48]
    reads, haps = _golden_reads_haps(rows)
    pairs = [(k, k) for k in range(len(rows))]
    got = rescue_scores_xf_banded(reads, haps, pairs)
    want = rescue_scores_xf(reads, haps, pairs)
    assert np.array_equal(got == 0, want == 0)
    nz = want != 0
    assert np.all(np.abs(np.log10(got[nz]) - np.log10(want[nz])) < 1e-9)
    for k, r in enumerate(rows):
        want_d = float.fromhex(r["scalard"])
        if want_d == 0.0 or got[k] == 0.0:
            continue
        assert abs(math.log10(got[k]) - math.log10(want_d)) < 1e-5, k


def test_xf_banded_streaming_tiers_bitexact(monkeypatch):
    """stream (HBM plane DMA) and stream+stream_carry (HBM carry windows)
    produce BIT-identical score triples to the all-VMEM xf kernel — the
    rescue tier has no VMEM cliff (VERDICT r2 item 7).  Long synthetic
    pairs force multiple carry windows (CW=256 < haplen)."""
    from mgl_tpu.kernels.pairhmm_xf_pallas import rescue_scores_xf_banded
    from mgl_tpu.ops.xfloat import rescue_scores_xf

    monkeypatch.setenv("MGL_TPU_PALLAS_INTERPRET", "1")
    # small synthetic pairs with one hap past CW=256 so stream_carry
    # crosses a window boundary; kept tiny — interpret pays per DP step,
    # and the golden-corpus coverage of the base kernel lives in
    # test_xf_banded_kernel_matches_scan_spec
    rng = np.random.default_rng(5)
    reads, haps = [], []
    for n, hlen in ((32, 288), (24, 80), (32, 120)):
        bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
        reads.append(dict(bases=bases,
                          q=rng.integers(10, 50, n).astype(np.uint8),
                          i=np.full(n, 45, np.uint8),
                          d=np.full(n, 45, np.uint8),
                          c=np.full(n, 10, np.uint8)))
        hp = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=hlen)
        hp[40: 40 + n] = bases
        haps.append(hp)
    pairs = [(i, j) for i in range(3) for j in range(3)]

    base = rescue_scores_xf_banded(reads, haps, pairs)
    strm = rescue_scores_xf_banded(reads, haps, pairs, stream=True)
    both = rescue_scores_xf_banded(reads, haps, pairs, stream=True,
                                   stream_carry=True)
    np.testing.assert_array_equal(base, strm)
    np.testing.assert_array_equal(base, both)
    # and the tiers stay inside the scan-spec contract
    want = rescue_scores_xf(reads, haps, pairs)
    nz = want != 0
    assert np.all(np.abs(np.log10(both[nz]) - np.log10(want[nz])) < 1e-9)


def test_rescue_decisions_and_tier_equivalence(pairhmm_golden):
    """Cascade with the device tier: rescue *decisions* come from the f32
    pass (unchanged); rescued scores agree with the scalar-f64 oracle tier
    to well within contract."""
    from mgl_tpu.ops.pairhmm import rescue_tier_scores

    rows = [r for r in pairhmm_golden
            if float.fromhex(r["scalarf"]) < float(MIN_ACCEPTED)]
    assert len(rows) >= 40  # the corpus has a real rescue tail
    reads, haps = _golden_reads_haps(rows)
    pairs = [(k, k) for k in range(len(rows))]

    old = os.environ.get("MGL_TPU_RESCUE")
    try:
        os.environ["MGL_TPU_RESCUE"] = "xf"
        xf = rescue_tier_scores(reads, haps, pairs)
        os.environ["MGL_TPU_RESCUE"] = "scalar"
        sc = rescue_tier_scores(reads, haps, pairs)
    finally:
        if old is None:
            os.environ.pop("MGL_TPU_RESCUE", None)
        else:
            os.environ["MGL_TPU_RESCUE"] = old
    nz = sc != 0
    assert np.array_equal(xf == 0, sc == 0)
    assert np.all(np.abs(np.log10(xf[nz]) - np.log10(sc[nz])) < 1e-9)


def test_use_double_cascade_via_xf(pairhmm_kat):
    """use_double=True routes everything through the device tier and still
    hits the KAT expectations (MicrosoftPairHmmUnitTest dataFileTest with
    useDoublePrecision=true)."""
    from mgl_tpu.api import PairHmmEngine

    from conftest import kat_read

    cases = pairhmm_kat[:12]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    out = PairHmmEngine(use_double=True).compute_likelihoods(reads, haps)
    for k, c in enumerate(cases):
        assert abs(out[k, k] - c["expected_log10"]) < 1e-5

"""TPU hardware parity tests for the Pallas kernels.

These run only with MGL_TPU_TEST_TPU=1 on a machine with a real TPU
(conftest otherwise forces the CPU backend, where the Mosaic kernels
cannot execute).  They assert the device kernels reproduce the lax.scan
fallbacks — which the rest of the suite pins to the reference golden
vectors — bit-for-bit (PairHMM f32) / exactly (SW int32).
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("MGL_TPU_TEST_TPU") != "1",
    reason="needs real TPU (set MGL_TPU_TEST_TPU=1)",
)
pytestmark = [pytest.mark.tpu, requires_tpu]


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    return jax.default_backend()


def _random_pairs(B=257, seed=42):
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    reads, haps, pairs = [], [], []
    for b in range(B):
        n = int(rng.integers(1, 120))
        h = int(rng.integers(1, 300))
        bases = rng.choice(alpha, size=n, p=[.24, .24, .24, .24, .04])
        q = rng.integers(6, 50, size=n).astype(np.uint8)
        reads.append(dict(bases=bases, q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
        haps.append(rng.choice(alpha[:4], size=h))
        pairs.append((b, b))
    return reads, haps, pairs


def test_pairhmm_banded_bit_identical(tpu_backend):
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_banded
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    reads, haps, pairs = _random_pairs()
    batch = pack_pairs(reads, haps, pairs)
    ref = forward_scores_xla(batch)
    for band in (16, 32):
        got = forward_scores_banded(batch, band=band)
        assert np.array_equal(got, ref), f"band={band} diverged"


def test_pairhmm_plane_bit_identical(tpu_backend):
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_plane
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    reads, haps, pairs = _random_pairs(seed=7)
    batch = pack_pairs(reads, haps, pairs)
    assert np.array_equal(forward_scores_plane(batch),
                          forward_scores_xla(batch))


def test_pairhmm_kat_through_engine(tpu_backend, pairhmm_kat):
    """105 reference known-answer cases through the full device cascade."""
    from mgl_tpu.api import PairHmmEngine
    from tests.conftest import kat_read

    eng = PairHmmEngine(impl="pallas")
    reads = [kat_read(c) for c in pairhmm_kat]
    for k, case in enumerate(pairhmm_kat):
        lik = eng.compute_likelihoods([reads[k]], [case["hap"].encode()])
        assert abs(lik[0, 0] - case["expected_log10"]) < 1e-5, case


@pytest.mark.parametrize("backend", ["banded", "plane"])
def test_sw_pallas_golden_cigars(tpu_backend, sw_golden, backend):
    """Pallas SW must emit the reference CIGAR/offset exactly."""
    from mgl_tpu.core.params import OverhangStrategy, SWParameters
    from mgl_tpu.kernels import sw_pallas

    align_batch = (sw_pallas.align_batch_banded if backend == "banded"
                   else sw_pallas.align_batch)
    # full corpus on the banded production kernel; the plane cross-check
    # keeps a sample (it exists as a second implementation only)
    cases = sw_golden if backend == "banded" else sw_golden[:400]
    by_key = {}
    for c in cases:
        key = (c["match"], c["mismatch"], c["open"], c["ext"], c["strategy"])
        by_key.setdefault(key, []).append(c)
    for (m, x, o, e, strategy), cs in by_key.items():
        got = align_batch([c["target"].encode() for c in cs],
                          [c["query"].encode() for c in cs],
                          SWParameters.normalized(m, x, o, e),
                          OverhangStrategy(strategy))
        for c, (cig, off) in zip(cs, got):
            assert cig == c["cigar_scalar"] and off == c["offset_scalar"], c


def test_sw_pallas_scores_match_forward(tpu_backend):
    from mgl_tpu.kernels.sw_pallas import (prepare_inputs, sw_pallas_forward,
                                           sw_pallas_scores)
    from mgl_tpu.ops.sw import compute_score_max

    rng = np.random.default_rng(3)
    B, T, Q = 256, 90, 80
    tbuf = rng.integers(65, 69, size=(B, T)).astype(np.int32)
    qbuf = rng.integers(65, 69, size=(B, Q)).astype(np.int32)
    tlen = rng.integers(10, T + 1, size=B).astype(np.int32)
    qlen = rng.integers(10, Q + 1, size=B).astype(np.int32)
    import jax.numpy as jnp

    tchar, qp, tl, ql = prepare_inputs(tbuf, tlen, qbuf, qlen)
    args = (jnp.asarray(tchar), jnp.asarray(qp), jnp.asarray(tl),
            jnp.asarray(ql), 25, -50, 110, 6)
    lc, lr, _ = sw_pallas_forward(*args, indel_init=False,
                                  with_traceback=False)
    ez = compute_score_max(np.asarray(lc)[:, :B], np.asarray(lr)[:, :B],
                           tlen, qlen)
    scores = np.asarray(sw_pallas_scores(*args, indel_init=False))[0, :B]
    assert np.array_equal(scores, ez["max"]), "score-only kernel diverged"


def test_pairhmm_product_expansion_bit_identical(tpu_backend):
    """Device-side product expansion == per-pair XLA reference."""
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_product
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    reads, haps = [], []
    for _ in range(41):
        n = int(rng.integers(1, 120))
        bases = rng.choice(alpha, size=n, p=[.24, .24, .24, .24, .04])
        q = rng.integers(6, 50, size=n).astype(np.uint8)
        reads.append(dict(bases=bases, q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
    for _ in range(7):
        haps.append(rng.choice(alpha[:4], size=int(rng.integers(1, 280))))
    pairs = [(ri, hi) for ri in range(41) for hi in range(7)]
    ref = forward_scores_xla(pack_pairs(reads, haps, pairs))
    got = forward_scores_product(reads, haps, pairs)
    assert np.array_equal(got, ref)


def test_mapper_device_windowing_matches_host(tpu_backend):
    """sw_score_windows (device-resident ref gather) == host-window path."""
    from mgl_tpu.core.params import SWParameters
    from mgl_tpu.pipelines.mapper import (ReferenceIndex, sw_score_batch,
                                          sw_score_windows)

    rng = np.random.default_rng(4)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(alpha, 200_000)
    index = ReferenceIndex.build(ref, k=16)
    B, L, wlen = 300, 100, 148
    starts = rng.integers(0, len(ref) - wlen, B).astype(np.int32)
    reads = ref[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(reads.shape) < 0.03
    reads[mut] = rng.choice(alpha, int(mut.sum()))
    p = SWParameters(25, -50, 110, 6)
    dev = sw_score_windows(index, starts, reads, wlen, p)
    win = ref[starts[:, None] + np.arange(wlen)[None, :]]
    host = sw_score_batch(win, reads, p)
    assert np.array_equal(dev, host)


def test_mapper_cigar_windows_match_aligner(tpu_backend):
    """sw_cigar_windows (device windows + banded traceback + strided
    decode) == the generic aligner on the same (window, read) pairs."""
    from mgl_tpu.api import OverhangStrategy, SmithWatermanAligner, SWParameters
    from mgl_tpu.pipelines.mapper import ReferenceIndex, sw_cigar_windows

    rng = np.random.default_rng(6)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(alpha, 150_000)
    index = ReferenceIndex.build(ref, k=16)
    B, L, wlen = 200, 120, 168
    starts = rng.integers(0, len(ref) - wlen, B).astype(np.int32)
    reads = ref[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(reads.shape) < 0.04
    reads[mut] = rng.choice(alpha, int(mut.sum()))
    p = SWParameters(25, -50, 110, 6)
    got = sw_cigar_windows(index, starts, reads, wlen, p,
                           OverhangStrategy.SOFTCLIP)
    win = ref[starts[:, None] + np.arange(wlen)[None, :]]
    want = SmithWatermanAligner().align_batch(
        [w.tobytes() for w in win], [r.tobytes() for r in reads], p,
        OverhangStrategy.SOFTCLIP)
    for i, ((cig, off), w) in enumerate(zip(got, want)):
        assert cig == w.cigar and off == w.offset, i


def test_pairhmm_shared_prefix_kernel_tpu(tpu_backend):
    """Prefix-sharing shared-hap-set kernel on hardware: sharing on == off
    bit-for-bit, and scores match the per-pair product kernel through the
    avxf-variant rescale within the 1e-5 contract."""
    from mgl_tpu.kernels.pairhmm_pallas import (forward_scores_product,
                                                forward_scores_shared)

    rng = np.random.default_rng(17)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(ACGT, 300)
    haps = [base.copy()]
    for p in sorted(int(x) for x in rng.integers(120, 290, 5)):
        h = haps[-1].copy()
        h[p] = ACGT[(int(np.searchsorted(ACGT, h[p])) + 1) % 4]
        haps.append(h)
    reads = []
    for _ in range(140):
        st = int(rng.integers(0, 180))
        b = base[st: st + 110].copy()
        b[rng.integers(0, 110)] = ACGT[rng.integers(0, 4)]
        q = rng.integers(15, 45, 110).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(110, 10, np.uint8)))
    shared = forward_scores_shared(reads, haps)
    noshare = forward_scores_shared(reads, haps, share=False)
    assert np.array_equal(shared, noshare)
    pairs = [(r, h) for r in range(len(reads)) for h in range(len(haps))]
    prod = forward_scores_product(reads, haps, pairs).reshape(
        len(reads), len(haps)).astype(np.float64)
    nz = prod > 0
    dl = np.abs(np.log10(shared[nz]) - np.log10(prod[nz]))
    assert dl.max() < 1e-5


def test_streaming_kernels_bitexact_tpu(tpu_backend):
    """HBM-streaming modes on hardware == all-VMEM kernels, bit for bit."""
    import jax.numpy as jnp

    import mgl_tpu.kernels.pairhmm_pallas as K
    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)
    from mgl_tpu.ops.pairhmm import pack_pairs

    rng = np.random.default_rng(2)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    B = 130
    tl = rng.integers(100, 600, B).astype(np.int32)
    ql = rng.integers(50, 200, B).astype(np.int32)
    T, Q = int(tl.max()), int(ql.max())
    tg = np.zeros((B, T), np.int32)
    qr = np.zeros((B, Q), np.int32)
    for b in range(B):
        tg[b, : tl[b]] = rng.choice(ACGT, tl[b])
        qr[b, : ql[b]] = rng.choice(ACGT, ql[b])
    tchar, qpad, tlo, qlo = prepare_inputs_banded(tg, tl, qr, ql)
    args = [jnp.asarray(x) for x in (tchar, qpad, tlo, qlo)]
    ez0, btr0 = sw_pallas_banded(*args, 25, -50, 110, 6, indel_init=False,
                                 with_traceback=True)
    ez1, btr1 = sw_pallas_banded(*args, 25, -50, 110, 6, indel_init=False,
                                 with_traceback=True, stream=True)
    assert np.array_equal(np.asarray(ez0), np.asarray(ez1))
    assert np.array_equal(np.asarray(btr0), np.asarray(btr1))

    reads, haps, pairs = _random_pairs(B=140, seed=5)
    batch = pack_pairs(reads, haps, pairs)
    a = K.prepare_inputs_banded(batch)
    keys = ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u", "pmx_u",
            "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0")
    ar = [jnp.asarray(a[k]) for k in keys]
    s0 = np.asarray(K.pairhmm_pallas_banded(*ar))
    s1 = np.asarray(K.pairhmm_pallas_banded(*ar, stream=True))
    assert np.array_equal(s0, s1)

    # stream_carry (long-hap / long-query) modes at small shapes: the
    # carry + hap/query planes window through VMEM from HBM, scores must
    # stay bit-identical to the all-VMEM kernels on real Mosaic too
    s2 = np.asarray(K.pairhmm_pallas_banded(*ar, stream=True,
                                            stream_carry=True))
    assert np.array_equal(s0, s2)
    ez2, _ = sw_pallas_banded(*args, 25, -50, 110, 6, indel_init=False,
                              with_traceback=True, stream=True,
                              stream_carry=True)
    assert np.array_equal(np.asarray(ez0), np.asarray(ez2))


def test_xfloat_rescue_on_tpu(tpu_backend, pairhmm_golden):
    """The extended-range rescue tier on hardware: golden rescue rows
    within 1e-5 log10 of the reference double kernels."""
    import math

    from mgl_tpu.core.context import MIN_ACCEPTED
    from mgl_tpu.ops.xfloat import rescue_scores_xf
    from tests.conftest import as_u8

    rows = [r for r in pairhmm_golden
            if float.fromhex(r["scalarf"]) < float(MIN_ACCEPTED)]
    reads = [dict(bases=as_u8(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [as_u8(r["hap"]) for r in rows]
    got = rescue_scores_xf(reads, haps, [(k, k) for k in range(len(rows))])
    for k, r in enumerate(rows):
        want = float.fromhex(r["avxd"])
        if want == 0.0:
            assert got[k] == 0.0, k
        else:
            assert abs(math.log10(got[k]) - math.log10(want)) < 1e-5, k


def test_xfloat_banded_kernel_on_tpu(tpu_backend, pairhmm_golden):
    """The banded Pallas xfloat rescue kernel on real Mosaic: full golden
    corpus, same underflow set as the XLA scan spec, within 1e-9 of it
    and 1e-5 of the reference double kernels."""
    import math

    from mgl_tpu.kernels.pairhmm_xf_pallas import rescue_scores_xf_banded
    from mgl_tpu.ops.xfloat import rescue_scores_xf
    from tests.conftest import as_u8

    rows = pairhmm_golden
    reads = [dict(bases=as_u8(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [as_u8(r["hap"]) for r in rows]
    pairs = [(k, k) for k in range(len(rows))]
    got = rescue_scores_xf_banded(reads, haps, pairs)
    want = rescue_scores_xf(reads, haps, pairs)
    assert np.array_equal(got == 0, want == 0)
    nz = want != 0
    assert np.all(np.abs(np.log10(got[nz]) - np.log10(want[nz])) < 1e-9)
    for k, r in enumerate(rows):
        wd = float.fromhex(r["avxd"])
        if wd == 0.0 or got[k] == 0.0:
            continue
        assert abs(math.log10(got[k]) - math.log10(wd)) < 1e-5, k


def test_denormal_canary_result_packing(tpu_backend, pairhmm_golden):
    """Fast canary for the hardware-only denormal-corruption class
    (CLAUDE.md round-4 hazard): XLA:TPU flushes f32 denormals and
    canonicalizes NaN payloads even in pure data movement, so every
    packed kernel result must ride INT32 across the XLA level.  Round 3
    shipped a corrupted xf fetch that only the 8-minute full hw parity
    suite caught; this test catches the class in seconds.

    (a) denormal/NaN-payload bit patterns round-trip bit-exactly through
        the exact movement ops the packs use (stack/copy/reshape/device
        transfer) when typed int32;
    (b) each packed-fetch path's device array dtype is integer — if a
        future change re-packs in f32, this fails before any numeric
        parity test does;
    (c) one xf rescue row fetches hardware-correct (nonzero-exponent)
        results end-to-end vs the XLA scan spec.
    """
    import jax
    import jax.numpy as jnp

    # (a) the movement contract int32 packs rely on
    pats = np.array([0x00000001, 0x00000003, 0x007fffff,   # f32 denormals
                     0x7f800001, 0xffc00001,               # NaN payloads
                     0x80000000, 0x00400000], np.uint32).view(np.int32)
    moved = np.asarray(jax.jit(
        lambda v: (jnp.stack([v, v]).reshape(2, -1) + 0).copy())(
            jnp.asarray(pats)))
    assert np.array_equal(moved[0], pats) and np.array_equal(moved[1], pats)

    # (b) dtype gates on the live packed-fetch paths
    import jax.numpy as _jnp

    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)

    t = np.frombuffer(b"ACGTACGTACGTACGT", np.uint8).astype(np.int32)[None]
    q = np.frombuffer(b"ACGTACGT", np.uint8).astype(np.int32)[None]
    tchar, qp, tl, ql = prepare_inputs_banded(
        t, np.array([16], np.int32), q, np.array([8], np.int32))
    ez_dev, btr_dev = sw_pallas_banded(
        _jnp.asarray(tchar), _jnp.asarray(qp), _jnp.asarray(tl),
        _jnp.asarray(ql), 25, -50, 110, 6, indel_init=False,
        with_traceback=True)
    assert np.issubdtype(ez_dev.dtype, np.integer), ez_dev.dtype
    assert np.issubdtype(btr_dev.dtype, np.integer), btr_dev.dtype

    from mgl_tpu.kernels.pairhmm_xf_pallas import rescue_scores_xf_banded
    from mgl_tpu.ops.xfloat import rescue_scores_xf
    from tests.conftest import as_u8

    row = pairhmm_golden[0]
    reads = [dict(bases=as_u8(row["read"]), q=np.array(row["q"], np.uint8),
                  i=np.array(row["i"], np.uint8),
                  d=np.array(row["d"], np.uint8),
                  c=np.array(row["c"], np.uint8))]
    haps = [as_u8(row["hap"])]
    finish = rescue_scores_xf_banded(reads, haps, [(0, 0)],
                                     async_result=True)
    packed_cells = [c.cell_contents for c in (finish.__closure__ or ())
                    if hasattr(c.cell_contents, "dtype")]
    assert packed_cells, "async finish() no longer closes over the " \
        "packed device result — update this canary with the new fetch path"
    for arr in packed_cells:
        assert np.issubdtype(arr.dtype, np.integer), (
            "packed xf result rides a float dtype across the XLA level — "
            "hardware will flush denormal bit patterns", arr.dtype)

    # (c) end-to-end value check on the single row (seconds, not minutes);
    # banded kernel vs scan spec contract is 1e-9 in log10 (different
    # summation order), and a flushed exponent would be ~36 log10 off
    got = finish()
    want = rescue_scores_xf(reads, haps, [(0, 0)])
    assert (got == 0).all() == (want == 0).all()
    nz = want != 0
    assert np.all(np.abs(np.log10(got[nz]) - np.log10(want[nz])) < 1e-9)


def test_xfloat_streaming_tiers_on_tpu(tpu_backend, pairhmm_golden):
    """xf stream / stream+stream_carry on real Mosaic DMA: bit-identical
    f64 scores to the all-VMEM xf kernel on a golden slice plus a
    long-hap pair that crosses the CW=256 carry window."""
    from mgl_tpu.kernels.pairhmm_xf_pallas import rescue_scores_xf_banded
    from tests.conftest import as_u8

    rows = pairhmm_golden[:64]
    reads = [dict(bases=as_u8(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [as_u8(r["hap"]) for r in rows]
    rng = np.random.default_rng(5)
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=120)
    reads.append(dict(bases=bases, q=np.full(120, 30, np.uint8),
                      i=np.full(120, 45, np.uint8),
                      d=np.full(120, 45, np.uint8),
                      c=np.full(120, 10, np.uint8)))
    hp = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=640)
    hp[100:220] = bases
    haps.append(hp)
    pairs = [(k, k) for k in range(len(reads))]
    base = rescue_scores_xf_banded(reads, haps, pairs)
    strm = rescue_scores_xf_banded(reads, haps, pairs, stream=True)
    both = rescue_scores_xf_banded(reads, haps, pairs, stream=True,
                                   stream_carry=True)
    np.testing.assert_array_equal(base, strm)
    np.testing.assert_array_equal(base, both)

"""HBM-streaming (long-sequence) modes of the banded kernels.

stream=True moves the per-row planes (SW target chars; PairHMM
transition/emission planes + read chars) to HBM and double-buffers
(band, LANES) slices through VMEM scratch — the TPU re-expression of the
reference's O(band x COLS) band streaming (compute_prob_avxf.cc:663-673,
sw_avx.cpp:37-49).  Scores and tracebacks must be bit-identical to the
all-VMEM kernels; these tests run small shapes under the Mosaic
interpreter so both modes execute everywhere.
"""

import os

import numpy as np
import pytest

import pytest as _pytest


@_pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    """Run Pallas under the Mosaic interpreter for THIS module only (a
    leaked env var would flip later 8-device tests onto the interpret
    path, which starves the pool on small hosts)."""
    monkeypatch.setenv("MGL_TPU_PALLAS_INTERPRET", "1")


def test_sw_banded_stream_bitexact():
    import jax.numpy as jnp

    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)

    rng = np.random.default_rng(2)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    B = 8
    tl = rng.integers(100, 300, B).astype(np.int32)
    ql = rng.integers(50, 150, B).astype(np.int32)
    T, Q = int(tl.max()), int(ql.max())
    tg = np.zeros((B, T), np.int32)
    qr = np.zeros((B, Q), np.int32)
    for b in range(B):
        tg[b, : tl[b]] = rng.choice(ACGT, tl[b])
        qr[b, : ql[b]] = rng.choice(ACGT, ql[b])
    tchar, qpad, tlo, qlo = prepare_inputs_banded(tg, tl, qr, ql)
    args = [jnp.asarray(x) for x in (tchar, qpad, tlo, qlo)]
    kw = dict(indel_init=False, interpret=True)
    ez0, btr0 = sw_pallas_banded(*args, 25, -50, 110, 6,
                                 with_traceback=True, **kw)
    ez1, btr1 = sw_pallas_banded(*args, 25, -50, 110, 6,
                                 with_traceback=True, stream=True, **kw)
    assert np.array_equal(np.asarray(ez0), np.asarray(ez1))
    assert np.array_equal(np.asarray(btr0), np.asarray(btr1))
    ez2, _ = sw_pallas_banded(*args, 25, -50, 110, 6,
                              with_traceback=False, stream=True, **kw)
    assert np.array_equal(np.asarray(ez0), np.asarray(ez2))


def test_sw_banded_stream_carry_bitexact():
    """stream_carry (long-query mode: carry + query planes windowed
    through VMEM from HBM) == the all-VMEM kernel, alone and combined
    with stream.  Small carry_window forces many chunk crossings."""
    import jax.numpy as jnp

    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)

    rng = np.random.default_rng(17)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    B = 8
    tl = rng.integers(100, 300, B).astype(np.int32)
    ql = rng.integers(60, 200, B).astype(np.int32)
    T, Q = int(tl.max()), int(ql.max())
    tg = np.zeros((B, T), np.int32)
    qr = np.zeros((B, Q), np.int32)
    for b in range(B):
        tg[b, : tl[b]] = rng.choice(ACGT, tl[b])
        qr[b, : ql[b]] = rng.choice(ACGT, ql[b])
    tchar, qpad, tlo, qlo = prepare_inputs_banded(tg, tl, qr, ql)
    args = [jnp.asarray(x) for x in (tchar, qpad, tlo, qlo)]
    kw = dict(indel_init=False, interpret=True)
    ez0, _ = sw_pallas_banded(*args, 25, -50, 110, 6,
                              with_traceback=True, **kw)
    ez1, _ = sw_pallas_banded(*args, 25, -50, 110, 6, with_traceback=True,
                              stream_carry=True, carry_window=64, **kw)
    ez2, = (sw_pallas_banded(*args, 25, -50, 110, 6, with_traceback=False,
                             stream=True, stream_carry=True,
                             carry_window=64, **kw),)
    assert np.array_equal(np.asarray(ez0), np.asarray(ez1))
    assert np.array_equal(np.asarray(ez0), np.asarray(ez2[0]))
    # raw traceback words may differ in dead (pre-wavefront / beyond-qlen)
    # cells, so CIGAR parity is asserted at the decode level
    from mgl_tpu.core.params import OverhangStrategy, SWParameters
    from mgl_tpu.kernels.sw_pallas import align_batch_banded

    params = SWParameters(25, -50, 110, 6)
    refs = [tg[b, : tl[b]].astype(np.uint8).tobytes() for b in range(B)]
    alts = [qr[b, : ql[b]].astype(np.uint8).tobytes() for b in range(B)]
    base = align_batch_banded(refs, alts, params, OverhangStrategy.SOFTCLIP)
    got = align_batch_banded(refs, alts, params, OverhangStrategy.SOFTCLIP,
                             stream=True, stream_carry=True)
    assert got == base


def test_sw_engine_dispatch_stream_carry(monkeypatch):
    """Buckets beyond both VMEM and streaming envelopes route to the
    stream_carry pallas tier (not XLA), with identical CIGARs."""
    import mgl_tpu.api as api
    import mgl_tpu.kernels.sw_pallas as SWP
    from mgl_tpu.core.params import OverhangStrategy, SWParameters

    rng = np.random.default_rng(19)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    params = SWParameters(25, -50, 110, 6)
    refs = [bytes(rng.choice(ACGT, 180)) for _ in range(3)]
    alts = [bytes(rng.choice(ACGT, 120)) for _ in range(3)]

    monkeypatch.setattr(api, "_sw_fits_vmem", lambda *a, **k: False)
    monkeypatch.setattr(api, "_sw_fits_stream", lambda *a, **k: False)
    seen = {}
    real = SWP.align_batch_banded

    def spy(*a, **k):
        seen.update(k)
        return real(*a, **k)

    monkeypatch.setattr(SWP, "align_batch_banded", spy)
    got = api.SmithWatermanAligner(impl="pallas").align_batch(
        refs, alts, params, OverhangStrategy.SOFTCLIP)
    assert seen.get("stream") is True and seen.get("stream_carry") is True
    want = api.SmithWatermanAligner(impl="xla").align_batch(
        refs, alts, params, OverhangStrategy.SOFTCLIP)
    assert [(r.cigar, r.offset) for r in got] == \
        [(r.cigar, r.offset) for r in want]


def test_pairhmm_banded_stream_bitexact():
    import jax.numpy as jnp

    import mgl_tpu.kernels.pairhmm_pallas as K
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    rng = np.random.default_rng(3)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    reads, haps = [], []
    for _ in range(12):
        n = int(rng.integers(8, 120))
        h = int(rng.integers(10, 200))
        q = rng.integers(10, 50, n).astype(np.uint8)
        reads.append(dict(bases=rng.choice(ACGT, n), q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
        haps.append(rng.choice(ACGT, h))
    batch = pack_pairs(reads, haps, [(k, k) for k in range(12)])
    a = K.prepare_inputs_banded(batch)
    keys = ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u", "pmx_u",
            "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0")
    args = [jnp.asarray(a[k]) for k in keys]
    s0 = np.asarray(K.pairhmm_pallas_banded(*args, interpret=True))
    s1 = np.asarray(K.pairhmm_pallas_banded(*args, interpret=True,
                                            stream=True))
    assert np.array_equal(s0, s1)
    want = forward_scores_xla(batch).astype(np.float32)
    assert np.array_equal(s0[0, :12], want)


def test_pairhmm_banded_stream_carry_bitexact():
    """PairHMM stream_carry (long-hap mode: carry + hap planes windowed
    through VMEM from HBM) == the all-VMEM kernel bit for bit, alone and
    combined with stream; small carry_window forces chunk crossings."""
    import jax.numpy as jnp

    import mgl_tpu.kernels.pairhmm_pallas as K
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    rng = np.random.default_rng(41)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    reads, haps = [], []
    for _ in range(12):
        n = int(rng.integers(8, 120))
        h = int(rng.integers(10, 200))
        q = rng.integers(10, 50, n).astype(np.uint8)
        reads.append(dict(bases=rng.choice(ACGT, n), q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
        haps.append(rng.choice(ACGT, h))
    batch = pack_pairs(reads, haps, [(k, k) for k in range(12)])
    a = K.prepare_inputs_banded(batch)
    keys = ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u", "pmx_u",
            "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0")
    args = [jnp.asarray(a[k]) for k in keys]
    s0 = np.asarray(K.pairhmm_pallas_banded(*args, interpret=True))
    s1 = np.asarray(K.pairhmm_pallas_banded(
        *args, interpret=True, stream_carry=True, carry_window=64))
    s2 = np.asarray(K.pairhmm_pallas_banded(
        *args, interpret=True, stream=True, stream_carry=True,
        carry_window=64))
    assert np.array_equal(s0, s1)
    assert np.array_equal(s0, s2)
    want = forward_scores_xla(batch).astype(np.float32)
    assert np.array_equal(s0[0, :12], want)


def test_pairhmm_engine_dispatch_stream_carry(monkeypatch):
    """Buckets beyond both PairHMM envelopes route through the
    stream_carry pallas tier (not XLA) and match the XLA impl."""
    import mgl_tpu.ops.pairhmm as P

    rng = np.random.default_rng(43)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    hap = rng.choice(ACGT, 150)
    reads = []
    for k in range(3):
        b = hap[5: 5 + 120].copy()
        mut = rng.random(120) < 0.02
        b[mut] = rng.choice(ACGT, int(mut.sum()))
        q = rng.integers(20, 40, 120).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(120, 10, np.uint8)))

    monkeypatch.setattr(P, "_pairhmm_fits_vmem", lambda *a, **k: False)
    monkeypatch.setattr(P, "_pairhmm_fits_stream", lambda *a, **k: False)
    monkeypatch.setattr(P, "_shared_product_scores", lambda *a, **k: None)
    orig = __import__("mgl_tpu.kernels.pairhmm_pallas",
                      fromlist=["forward_scores_product"])
    real_fsp = orig.forward_scores_product
    calls = {}

    def spy(*a, **k):
        calls.update(k)
        return real_fsp(*a, **k)

    monkeypatch.setattr(orig, "forward_scores_product", spy)
    got = P.compute_likelihoods(reads, [hap], impl="pallas")
    assert calls.get("stream_carry") is True
    want = P.compute_likelihoods(reads, [hap], impl="xla")
    assert np.max(np.abs(got - want)) < 1e-9


def test_engine_dispatch_uses_streaming_tier(monkeypatch):
    """Buckets beyond the VMEM envelope but inside the streaming envelope
    go through the pallas streaming path (not the XLA fallback), and the
    cascade output matches the XLA impl."""
    import mgl_tpu.ops.pairhmm as P

    rng = np.random.default_rng(5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    hap = rng.choice(ACGT, 150)
    reads = []
    for k in range(3):
        b = hap[5: 5 + 120].copy()
        mut = rng.random(120) < 0.02
        b[mut] = rng.choice(ACGT, int(mut.sum()))
        q = rng.integers(20, 40, 120).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(120, 10, np.uint8)))

    calls = {}
    real = P._pairhmm_fits_vmem
    monkeypatch.setattr(P, "_pairhmm_fits_vmem", lambda *a, **k: False)
    monkeypatch.setattr(P, "_shared_product_scores", lambda *a, **k: None)
    orig = __import__("mgl_tpu.kernels.pairhmm_pallas",
                      fromlist=["forward_scores_product"])
    real_fsp = orig.forward_scores_product

    def spy(*a, **k):
        calls["stream"] = k.get("stream")
        return real_fsp(*a, **k)

    monkeypatch.setattr(orig, "forward_scores_product", spy)
    got = P.compute_likelihoods(reads, [hap], impl="pallas")
    assert calls.get("stream") is True
    want = P.compute_likelihoods(reads, [hap], impl="xla")
    assert np.max(np.abs(got - want)) < 1e-9


@pytest.mark.tpu
def test_sw_long_target_stream_tpu():
    """20 kbp x 5 kbp SW through the streaming banded kernel on hardware
    (the VERDICT r1 'done' case), score anchored to the scalar oracle.

    Long-target *CIGAR* correctness on hardware composes from two facts
    asserted elsewhere: stream==vmem is bit-identical including the
    traceback words (test_streaming_kernels_bitexact_tpu), and the vmem
    traceback reproduces the full golden corpus
    (test_sw_pallas_golden_cigars).  A direct 12 kbp traceback compile
    exceeds the dev pool's remote-compile limits (~25 min then
    UNAVAILABLE), so it is not exercised end-to-end here."""
    if os.environ.get("MGL_TPU_TEST_TPU") != "1":
        pytest.skip("TPU hardware tests disabled")
    import jax.numpy as jnp

    from mgl_tpu.api import _sw_fits_stream, _sw_fits_vmem
    from mgl_tpu.core.params import OverhangStrategy, SWParameters
    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)
    from mgl_tpu.ref_impl.sw_scalar import calculate_matrix

    rng = np.random.default_rng(11)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    params = SWParameters(25, -50, 110, 6)

    tgt = rng.choice(ACGT, 20000)
    q = tgt[7000:12000].copy()
    mut = rng.random(len(q)) < 0.01
    q[mut] = rng.choice(ACGT, int(mut.sum()))
    assert not _sw_fits_vmem(len(tgt), len(q))
    assert _sw_fits_stream(len(tgt), len(q))
    tchar, qpad, tl, ql = prepare_inputs_banded(
        tgt[None, :].astype(np.int32), np.array([len(tgt)], np.int32),
        q[None, :].astype(np.int32), np.array([len(q)], np.int32))
    ez, _ = sw_pallas_banded(
        jnp.asarray(tchar), jnp.asarray(qpad), jnp.asarray(tl),
        jnp.asarray(ql), 25, -50, 110, 6, indel_init=False,
        with_traceback=False, stream=True)
    got_best = int(np.asarray(ez)[2, 0])
    _, ezs = calculate_matrix(tgt, q, params, OverhangStrategy.SOFTCLIP)
    assert got_best == int(ezs["max"])


@pytest.mark.tpu
def test_sw_long_query_stream_carry_tpu():
    """12 kbp x 6.5 kbp — a *query* beyond the carry-in-VMEM streaming
    envelope — through stream+stream_carry on hardware, score anchored to
    the scalar oracle.  CIGAR parity for this mode is asserted at small
    shapes (test_sw_banded_stream_carry_bitexact); score-only here keeps
    the remote compile inside the dev pool's limits."""
    if os.environ.get("MGL_TPU_TEST_TPU") != "1":
        pytest.skip("TPU hardware tests disabled")
    import jax.numpy as jnp

    from mgl_tpu.api import _sw_fits_stream, _sw_fits_vmem
    from mgl_tpu.core.params import OverhangStrategy, SWParameters
    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)
    from mgl_tpu.ref_impl.sw_scalar import calculate_matrix

    rng = np.random.default_rng(23)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    params = SWParameters(25, -50, 110, 6)

    tgt = rng.choice(ACGT, 12000)
    q = tgt[2500:9000].copy()
    mut = rng.random(len(q)) < 0.01
    q[mut] = rng.choice(ACGT, int(mut.sum()))
    assert not _sw_fits_vmem(len(tgt), len(q))
    assert not _sw_fits_stream(len(tgt), len(q))
    tchar, qpad, tl, ql = prepare_inputs_banded(
        tgt[None, :].astype(np.int32), np.array([len(tgt)], np.int32),
        q[None, :].astype(np.int32), np.array([len(q)], np.int32))
    ez, = (sw_pallas_banded(
        jnp.asarray(tchar), jnp.asarray(qpad), jnp.asarray(tl),
        jnp.asarray(ql), 25, -50, 110, 6, indel_init=False,
        with_traceback=False, stream=True, stream_carry=True),)
    got_best = int(np.asarray(ez[0])[2, 0])
    _, ezs = calculate_matrix(tgt, q, params, OverhangStrategy.SOFTCLIP)
    assert got_best == int(ezs["max"])


@pytest.mark.tpu
def test_pairhmm_long_hap_stream_carry_tpu():
    """A 5.6 kbp haplotype — beyond the carry-in-VMEM envelope — through
    the engine on hardware (stream_carry tier), within the 1e-5 log10
    contract of the f64 scalar reference.

    5.6 kbp compiles in ~4 min on the dev pool; ~6.5 kbp and beyond hits
    the pool's remote-compile ceiling (~25 min then UNAVAILABLE) — a dev
    artifact, not a kernel bound (the same kernel at 5.6k is exact, and
    the CPU interpreter runs it at any length)."""
    if os.environ.get("MGL_TPU_TEST_TPU") != "1":
        pytest.skip("TPU hardware tests disabled")
    import mgl_tpu.ops.pairhmm as P
    from mgl_tpu.ref_impl import pairhmm_scalar

    rng = np.random.default_rng(47)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    hap = rng.choice(ACGT, 5600)
    reads = []
    for k in range(3):
        st = int(rng.integers(0, 5200))
        b = hap[st: st + 250].copy()
        mut = rng.random(250) < 0.02
        b[mut] = rng.choice(ACGT, int(mut.sum()))
        q = rng.integers(20, 40, 250).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(250, 10, np.uint8)))
    assert not P._pairhmm_fits_vmem(250, 5600)
    assert not P._pairhmm_fits_stream(250, 5600)
    got = P.compute_likelihoods(reads, [hap], impl="pallas")
    want = pairhmm_scalar.compute_likelihoods(reads, [hap])
    assert np.max(np.abs(got - want)) < 1e-5, (got[:, 0], want[:, 0])

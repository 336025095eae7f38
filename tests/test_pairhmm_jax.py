"""Batched JAX PairHMM op vs KAT + C++ golden scores."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from mgl_tpu.api import PairHmmEngine
from mgl_tpu.core.context import CTX_F32, MIN_ACCEPTED
from mgl_tpu.ops.pairhmm import pack_pairs, pairhmm_forward_f32

from conftest import as_u8, kat_read


def _forward(batch):
    return np.asarray(
        pairhmm_forward_f32(
            jnp.asarray(batch.hap), jnp.asarray(batch.haplen),
            jnp.asarray(batch.rchar), jnp.asarray(batch.rslen),
            jnp.asarray(batch.p_mm), jnp.asarray(batch.p_gapm),
            jnp.asarray(batch.p_mx), jnp.asarray(batch.p_my),
            jnp.asarray(batch.p_zz),
            jnp.asarray(batch.distm_match), jnp.asarray(batch.distm_mis),
            jnp.asarray(batch.y_init),
        )
    )


def test_kat_full_batch(pairhmm_kat):
    """All 105 KAT cases in one padded batch through the cascade."""
    reads = [kat_read(c) for c in pairhmm_kat]
    haps = [as_u8(c["hap"]) for c in pairhmm_kat]
    eng = PairHmmEngine()
    # run as B diagonal pairs (read k vs hap k) via the packed forward + cascade
    from mgl_tpu.ops.pairhmm import compute_likelihoods
    # compute pairwise via the public engine on the diagonal: engine computes
    # the full product, so slice per-case to keep runtime down
    batch = pack_pairs(reads, haps, [(k, k) for k in range(len(reads))])
    scores = _forward(batch)
    from mgl_tpu.core.context import CTX_F64
    from mgl_tpu.ref_impl.pairhmm_scalar import compute_score
    for k, c in enumerate(pairhmm_kat):
        s = float(scores[k])
        if s >= float(MIN_ACCEPTED):
            lik = math.log10(s) - float(CTX_F32.log10_initial_constant)
        else:
            rd = reads[k]
            s64 = compute_score(haps[k], rd["bases"], rd["q"], rd["i"],
                                rd["d"], rd["c"], ctx=CTX_F64)
            lik = math.log10(s64) - float(CTX_F64.log10_initial_constant)
        assert abs(lik - c["expected_log10"]) < 1e-5, (k, lik, c["expected_log10"])


def test_engine_product_layout(pairhmm_kat):
    """Engine computes the full reads x haps matrix in JNI-driver layout."""
    cases = pairhmm_kat[:3]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    out = PairHmmEngine().compute_likelihoods(reads, haps)
    assert out.shape == (3, 3)
    for k, c in enumerate(cases):
        assert abs(out[k, k] - c["expected_log10"]) < 1e-5


def test_rescue_agreement_vs_cpp(pairhmm_golden):
    rows = pairhmm_golden[::3]
    b = as_u8
    reads = [dict(bases=b(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [b(r["hap"]) for r in rows]
    batch = pack_pairs(reads, haps, [(k, k) for k in range(len(rows))])
    scores = _forward(batch)
    for k, r in enumerate(rows):
        g32 = float.fromhex(r["scalarf"])
        s = float(scores[k])
        assert (s < float(MIN_ACCEPTED)) == (g32 < float(MIN_ACCEPTED))
        if g32 >= float(MIN_ACCEPTED):
            assert abs(math.log10(s) - math.log10(g32)) < 1e-5


def test_engine_stream_matches_sequential(pairhmm_kat):
    """compute_likelihoods_stream pipelines batches (dispatch/finalize
    split, one thread); results come back in input order, bit-identical
    to sequential calls."""
    cases = pairhmm_kat[:6]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    eng = PairHmmEngine()
    batches = [(reads[i:i + 2], haps[i:i + 2]) for i in (0, 2, 4)]
    seq = [eng.compute_likelihoods(r, h) for r, h in batches]
    piped = list(eng.compute_likelihoods_stream(iter(batches), depth=2))
    assert len(piped) == len(seq)
    for a, b in zip(seq, piped):
        assert np.array_equal(a, b)


def test_engine_validation():
    eng = PairHmmEngine()
    with pytest.raises(ValueError):
        eng.compute_likelihoods(
            [dict(bases=b"ACGT", q=[30, 30], i=[30] * 4, d=[30] * 4, c=[10] * 4)],
            [b"ACGT"],
        )


def test_haplotype_similarities_reference_semantics():
    from mgl_tpu.ops.pairhmm import compute_haplotype_similarities

    u8 = lambda s: np.frombuffer(s, np.uint8)
    # identical consecutive haps share their full (even) length
    pos, cmin, cmax = compute_haplotype_similarities(
        [u8(b"ACGTACGT"), u8(b"ACGTACGT")])
    assert list(pos) == [0, 8] and (cmin, cmax) == (8, 8)
    # predecessor shorter than 8 bases -> no sharing recorded
    pos, _, _ = compute_haplotype_similarities([u8(b"ACGTACG"), u8(b"ACGTACG")])
    assert list(pos) == [0, 0]
    # divergence at an odd position rounds down to even
    pos, _, _ = compute_haplotype_similarities(
        [u8(b"ACGTACGTA"), u8(b"ACGTATTTT")])
    assert list(pos) == [0, 4]
    # sharing less than the predecessor's own prefix resets to 0
    pos, cmin, cmax = compute_haplotype_similarities(
        [u8(b"A" * 16), u8(b"A" * 16), u8(b"AA" + b"C" * 14)])
    assert list(pos) == [0, 16, 0]
    assert (cmin, cmax) == (16, 16)
    pos, cmin, cmax = compute_haplotype_similarities([])
    assert len(pos) == 0 and (cmin, cmax) == (0, 0)


def test_duplicate_hap_dedup_matches_full_product(pairhmm_kat):
    cases = pairhmm_kat[:4]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(cases[0]["hap"]), as_u8(cases[1]["hap"]),
            as_u8(cases[0]["hap"]), as_u8(cases[0]["hap"])]
    eng = PairHmmEngine()
    out = eng.compute_likelihoods(reads, haps)
    assert out.shape == (4, 4)
    # duplicate columns are bit-identical copies of the canonical one
    assert np.array_equal(out[:, 2], out[:, 0])
    assert np.array_equal(out[:, 3], out[:, 0])
    # and the deduped product equals a from-scratch two-hap product
    ref = eng.compute_likelihoods(reads, haps[:2])
    assert np.array_equal(out[:, :2], ref)


def test_bucketed_product_matches_single_bucket(pairhmm_kat):
    """Mixed-length products split across pad buckets must equal the
    unbucketed result exactly (padding is inert)."""
    from mgl_tpu.ops.pairhmm import compute_likelihoods

    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for n in (7, 40, 130):
        q = rng.integers(10, 45, size=n).astype(np.uint8)
        reads.append(dict(bases=rng.choice(alpha, n), q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
    haps = [rng.choice(alpha, h) for h in (20, 90, 300)]
    out = compute_likelihoods(reads, haps)
    # single pairs computed independently must match the bucketed product
    for ri in range(3):
        for hi in range(3):
            single = compute_likelihoods([reads[ri]], [haps[hi]])
            assert single[0, 0] == out[ri, hi], (ri, hi)


def test_seed_extend_matches_reference_fast_kernel(pairhmm_golden):
    """Tier-0 seed-extend scores vs the reference's compute_fast_prob
    golden values (hex-exact dumps)."""
    from mgl_tpu.ops.seed_extend import fast_scores

    rows = pairhmm_golden[::2]
    b = as_u8
    reads = [dict(bases=b(r["read"]), q=np.array(r["q"], np.uint8),
                  i=np.array(r["i"], np.uint8), d=np.array(r["d"], np.uint8),
                  c=np.array(r["c"], np.uint8)) for r in rows]
    haps = [b(r["hap"]) for r in rows]
    got = fast_scores(reads, haps, [(k, k) for k in range(len(rows))])
    checked = 0
    for k, r in enumerate(rows):
        want = float.fromhex(r["fast"])
        g = float(got[k])
        if want == 0.0:
            assert g == 0.0 or abs(g) < 1e-30, (k, g)
        else:
            assert abs(g - want) / abs(want) < 1e-6, (k, g, want)
        checked += 1
    assert checked >= 100


def test_engine_fast_path_gates_correctly(pairhmm_kat):
    """fast_path=True: pairs clearing MIN_ACCEPTED take the estimator, the
    rest fall through to the exact DP cascade."""
    from mgl_tpu.core.context import MIN_ACCEPTED
    from mgl_tpu.ops.seed_extend import fast_scores

    cases = pairhmm_kat[:24]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    pairs = [(k, k) for k in range(len(cases))]
    fs = fast_scores(reads, haps, pairs)

    eng_fast = PairHmmEngine(fast_path=True)
    eng_exact = PairHmmEngine()
    for k, c in enumerate(cases):
        lik = eng_fast.compute_likelihoods([reads[k]], [haps[k]])[0, 0]
        exact = eng_exact.compute_likelihoods([reads[k]], [haps[k]])[0, 0]
        if fs[k] >= float(MIN_ACCEPTED):
            import math
            from mgl_tpu.core.context import CTX_F32
            want = math.log10(float(fs[k])) - float(
                CTX_F32.log10_initial_constant)
            assert abs(lik - want) < 1e-9, (k, lik, want)
        else:
            assert lik == exact, k


def test_engine_normalizes_alphabet():
    """Lowercase and IUPAC bases normalize to one alphabet (acgt->ACGT,
    other codes -> N) so every kernel tier computes the same quantity."""
    eng = PairHmmEngine()
    q = np.full(8, 35, np.uint8)
    mk = lambda b: dict(bases=b, q=q, i=np.full(8, 45, np.uint8),
                        d=np.full(8, 45, np.uint8), c=np.full(8, 10, np.uint8))
    a = eng.compute_likelihoods([mk(b"acgtACGT")], [b"ACGTACGTACGT"])
    b = eng.compute_likelihoods([mk(b"ACGTACGT")], [b"acgtacgtacgt"])
    assert a[0, 0] == b[0, 0]
    # IUPAC 'R' behaves exactly like 'N'
    r = eng.compute_likelihoods([mk(b"ACGRACGT")], [b"ACGTACGTACGT"])
    n = eng.compute_likelihoods([mk(b"ACGNACGT")], [b"ACGTACGTACGT"])
    assert r[0, 0] == n[0, 0]


def test_pairhmm_batch_permutation_invariance(pairhmm_kat):
    """Likelihoods must not depend on pair order or lane placement."""
    cases = pairhmm_kat[:12]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    eng = PairHmmEngine()
    base = eng.compute_likelihoods(reads, haps)
    rng = np.random.default_rng(4)
    pr = rng.permutation(len(reads))
    ph = rng.permutation(len(haps))
    shuf = eng.compute_likelihoods([reads[i] for i in pr],
                                   [haps[j] for j in ph])
    for a, i in enumerate(pr):
        for b, j in enumerate(ph):
            assert shuf[a, b] == base[i, j], (i, j)

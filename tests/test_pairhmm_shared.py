"""Prefix-sharing shared-hap-set PairHMM kernel (TPU interpreter on CPU).

The reference optimization being reproduced: compute_prob_avxf.cc:943-967
(column cache at each hap's shared-prefix boundary) + 1068-1071 (partial
sum seeding), with yInitial = IC/COLS_MAX and the final COLS_MAX/haplen
rescale (avxf.cc:661,1086).
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


def _gatk_shaped(rng, n_reads=11, n_haps=6, hap_len=160, read_hi=120,
                 read_lo=20, snp_lo=None):
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(ACGT, hap_len)
    haps = [base.copy()]
    for k in range(n_haps - 1):
        h = base.copy()
        p = int(rng.integers(snp_lo or hap_len // 4, hap_len - 10))
        h[p] = ACGT[(int(np.searchsorted(ACGT, h[p])) + 1) % 4]
        if k % 2:
            h = np.concatenate([h[:p], ACGT[rng.integers(0, 4, 3)], h[p:]])
        haps.append(h)
    reads = []
    for _ in range(n_reads - 1):
        n = int(rng.integers(read_lo, read_hi))
        q = rng.integers(10, 50, n).astype(np.uint8)
        reads.append(dict(bases=rng.choice(ACGT, n), q=q, i=q, d=q,
                          c=np.full(n, 10, np.uint8)))
    n = min(100, hap_len - 40)
    reads.append(dict(bases=base[30: 30 + n], q=np.full(n, 40, np.uint8),
                      i=np.full(n, 40, np.uint8), d=np.full(n, 40, np.uint8),
                      c=np.full(n, 10, np.uint8)))
    return reads, haps


def test_shared_bitexact_vs_full_sweeps():
    """Sharing on == sharing off, bit for bit: the checkpointed wavefront
    restore reproduces the skipped shared-prefix columns exactly."""
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_shared

    rng = np.random.default_rng(7)
    reads, haps = _gatk_shaped(rng)
    noshare = forward_scores_shared(reads, haps, share=False)
    shared = forward_scores_shared(reads, haps, share=True)
    assert np.array_equal(shared, noshare)


def test_shared_matches_spec_within_contract():
    """avxf-variant scores within the 1e-5 log10 contract of the scalar
    spec (forward_scores_xla), including hap sets with duplicates and
    position resets."""
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_shared
    from mgl_tpu.ops.pairhmm import forward_scores_xla, pack_pairs

    rng = np.random.default_rng(11)
    reads, haps = _gatk_shaped(rng, n_reads=9, n_haps=5, hap_len=120)
    haps.append(haps[1].copy())          # exact duplicate -> 0-length segment
    shared = forward_scores_shared(reads, haps)
    batch = pack_pairs(reads, haps,
                       [(r, h) for r in range(len(reads))
                        for h in range(len(haps))])
    spec = forward_scores_xla(batch).reshape(len(reads), len(haps))
    nz = spec > 0
    dl = np.abs(np.log10(shared[nz]) - np.log10(spec.astype(np.float64)[nz]))
    assert dl.max() < 1e-5
    # duplicate hap column must equal its twin bit-for-bit
    assert np.array_equal(shared[:, -1], shared[:, 1])


def test_shared_hap_chunking_matches_unchunked():
    """VMEM-driven hap chunking (chunk starts reset sharing) returns the
    same scores as one unchunked call."""
    from mgl_tpu.kernels.pairhmm_pallas import forward_scores_shared
    from mgl_tpu.ops.pairhmm import _shared_hap_chunks

    rng = np.random.default_rng(13)
    reads, haps = _gatk_shaped(rng, n_reads=6, n_haps=8, hap_len=100,
                               read_hi=60)
    chunks = _shared_hap_chunks(haps, 64, budget=0.35e6)
    assert len(chunks) > 1
    cmax = max(len(h) for h in haps)
    whole = forward_scores_shared(reads, haps)
    parts = [forward_scores_shared(reads, haps[lo:hi], cols_max=cmax)
             for lo, hi in chunks]
    # chunk boundaries recompute (not resume) their first hap; with the
    # whole set's COLS_MAX pinned, every score bit is chunk-invariant
    got = np.concatenate(parts, axis=1)
    assert np.array_equal(got, whole)


def test_engine_uses_shared_kernel_consistently():
    """compute_likelihoods with the pallas impl (interpret) on a
    full-lane product: cascade output within contract of the xla impl."""
    from mgl_tpu.ops.pairhmm import _shared_product_scores, compute_likelihoods

    rng = np.random.default_rng(17)
    # GATK-realistic shape: uniform-length reads filling the VPU lanes,
    # haps diverging late (high prefix sharing)
    reads, haps = _gatk_shaped(rng, n_reads=256, n_haps=6, hap_len=300,
                               read_lo=90, read_hi=100, snp_lo=180)
    # the work heuristic must pick shared mode for this shape
    assert _shared_product_scores(reads, haps) is not None
    got = compute_likelihoods(reads, haps, impl="pallas")
    want = compute_likelihoods(reads, haps, impl="xla")
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-5


def test_shared_hap_chunks_budget_is_chunk_local():
    """_shared_hap_chunks must budget with CHUNK-LOCAL share positions:
    the reset rule is relative to the predecessor's position, so a hap
    that kept its prefix in the full list can reset to 0 inside a chunk,
    lengthening the real stream.  Every produced chunk, re-evaluated
    exactly as forward_scores_shared will (compute_haplotype_similarities
    on the chunk slice), must fit the VMEM budget."""
    from mgl_tpu.kernels.pairhmm_pallas import shared_vmem_bytes
    from mgl_tpu.ops.pairhmm import (_raw_even_prefixes, _shared_hap_chunks,
                                     compute_haplotype_similarities)

    rng = np.random.default_rng(31)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    for trial in range(40):
        n_haps = int(rng.integers(4, 24))
        hlen = int(rng.integers(120, 900))
        base = rng.choice(ACGT, hlen)
        haps = []
        for _ in range(n_haps):
            h = base.copy()
            # mutations at unsorted random positions: consecutive-pair
            # prefixes jump up and down, triggering the reset rule both
            # in the full list and (differently) inside chunks
            for p in rng.integers(0, hlen, int(rng.integers(1, 5))):
                h[p] = ACGT[(int(np.searchsorted(ACGT, h[p])) + 1) % 4]
            haps.append(h)
        # the raw-prefix replay reproduces the full-list positions
        raw = _raw_even_prefixes(haps)
        pos_replay = np.zeros(n_haps, np.int64)
        for j in range(1, n_haps):
            pos_replay[j] = (raw[j]
                             if raw[j] >= pos_replay[j - 1] else 0)
        pos_full, _, _ = compute_haplotype_similarities(haps)
        assert np.array_equal(pos_replay, pos_full), trial

        rdlen = int(rng.integers(60, 200))
        budget = 13e6
        for lo, hi in _shared_hap_chunks(haps, rdlen, budget=budget):
            pos_c, _, _ = compute_haplotype_similarities(haps[lo:hi])
            stream = sum(len(h) - int(p)
                         for h, p in zip(haps[lo:hi], pos_c))
            assert shared_vmem_bytes(rdlen, stream, hi - lo) <= budget, (
                trial, lo, hi, stream)

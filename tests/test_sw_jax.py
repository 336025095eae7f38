"""Batched JAX SW op vs golden vectors (exact CIGAR/offset parity)."""

import numpy as np
import pytest

from mgl_tpu.api import SmithWatermanAligner
from mgl_tpu.core.params import OverhangStrategy, SWParameters


def _run_cases(rows):
    aligner = SmithWatermanAligner()
    from collections import defaultdict
    groups = defaultdict(list)
    for r in rows:
        groups[(r["match"], r["mismatch"], r["open"], r["ext"], r["strategy"])].append(r)
    for (m, x, o, e, s), rs in groups.items():
        p = SWParameters.normalized(m, x, o, e)
        res = aligner.align_batch(
            [r["target"].encode() for r in rs],
            [r["query"].encode() for r in rs],
            p, OverhangStrategy(s),
        )
        for r, got in zip(rs, res):
            assert got.cigar == r["cigar_scalar"], (r["target"], r["query"], s)
            assert got.offset == r["offset_scalar"]


def test_sw_small_cases_all_strategies(sw_golden):
    # all four strategies on short pairs — single bucket shape, fast compile
    rows = [r for r in sw_golden
            if len(r["target"]) <= 60 and len(r["query"]) <= 60]
    assert len(rows) >= 40
    _run_cases(rows)


def test_sw_medium_cases(sw_golden):
    rows = [r for r in sw_golden
            if 60 < max(len(r["target"]), len(r["query"])) <= 120][:48]
    assert rows
    _run_cases(rows)


@pytest.mark.slow
def test_sw_full_golden_sweep(sw_golden):
    _run_cases(sw_golden)


def test_api_validation():
    a = SmithWatermanAligner()
    p = SWParameters(25, -50, 110, 6)
    with pytest.raises(ValueError):
        a.align(b"", b"ACGT", p, OverhangStrategy.SOFTCLIP)
    with pytest.raises(ValueError):
        a.align_batch([b"ACGT"], [], p, OverhangStrategy.SOFTCLIP)


def test_long_pair_vmem_fallback():
    """Pairs too large for the banded kernel's VMEM working set route to
    the XLA path automatically and still align exactly."""
    from mgl_tpu.api import _sw_fits_vmem

    assert _sw_fits_vmem(8000, 2000)
    assert not _sw_fits_vmem(8000, 6000)
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    t = rng.choice(alpha, 9000).tobytes()
    q = bytearray(t[500:7600])
    q[3000:3000] = b"ACGTT"
    r = SmithWatermanAligner().align(t, bytes(q), SWParameters(25, -50, 110, 6),
                                     OverhangStrategy.SOFTCLIP)
    # the tie rules may slide the equal-scoring insert placement
    assert r.offset == 500
    import re
    segs = re.findall(r"(\d+)([MID])", r.cigar)
    assert sum(int(n) for n, s in segs if s == "M") == 7100
    assert [(int(n), s) for n, s in segs if s == "I"] == [(5, "I")]


def test_batch_permutation_invariance():
    """Per-pair results must not depend on lane placement or batch order
    (catches cross-lane leaks in the kernels)."""
    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    refs, alts = [], []
    for _ in range(37):
        t = rng.choice(alpha, int(rng.integers(20, 150))).tobytes()
        q = bytearray(t[: int(rng.integers(10, len(t)))])
        for _ in range(int(rng.integers(0, 4))):
            q[int(rng.integers(len(q)))] = int(rng.choice(alpha))
        refs.append(t)
        alts.append(bytes(q))
    a = SmithWatermanAligner()
    p = SWParameters(25, -50, 110, 6)
    base = a.align_batch(refs, alts, p, OverhangStrategy.SOFTCLIP)
    perm = rng.permutation(len(refs))
    shuf = a.align_batch([refs[i] for i in perm], [alts[i] for i in perm],
                         p, OverhangStrategy.SOFTCLIP)
    for k, i in enumerate(perm):
        assert shuf[k] == base[i], (k, i)

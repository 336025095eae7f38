"""Deterministic fuzz-case generators shared by golden dump + tests.

Produces SW pairs and PairHMM read/hap combos across edge conditions the
reference exercises: short queries (<8, scalar JNI dispatch), substring
pairs, high-identity pairs with indels, N wildcards, extreme quals.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
BASES_N = np.frombuffer(b"ACGTN", dtype=np.uint8)


def _rand_seq(rng, length, with_n=False):
    pool = BASES_N if with_n else BASES
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return rng.choice(pool, size=length, p=p)


def _mutate(rng, seq, sub_rate=0.05, indel_rate=0.02, max_indel=6):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < indel_rate / 2:  # deletion
            i += int(rng.integers(1, max_indel))
            continue
        if r < indel_rate:  # insertion
            out.extend(_rand_seq(rng, int(rng.integers(1, max_indel))))
        if rng.random() < sub_rate:
            out.append(int(rng.choice(BASES)))
        else:
            out.append(int(seq[i]))
        i += 1
    if not out:
        out = [int(rng.choice(BASES))]
    return np.array(out, dtype=np.uint8)


def sw_cases(seed=0, n_random=300):
    """Yield (target, query) uint8 pairs."""
    rng = np.random.default_rng(seed)
    # hand-picked edges
    fixed = [
        (b"ACGT", b"ACGT"),
        (b"ACGTACGTACGT", b"ACGT"),          # query substring, short (<8)
        (b"ACGT", b"ACGTACGTACGT"),          # query overhangs both sides
        (b"AAAAAAAAAA", b"TTTTTTTTTT"),      # all mismatch
        (b"ACGTACGTACGTACGT", b"ACGTAGGTACGT"),
        (b"GGGGACGTACGTACGT", b"ACGTACGT"),
        (b"ACGTACGTACGTGGGG", b"ACGTACGT"),
        (b"AC", b"AC"),
        (b"A", b"ACGTA"),
        (b"ACGTA", b"A"),
        (b"ACGTNACGT", b"ACGTACGT"),         # N treated as ordinary mismatching char in SW
    ]
    for t, q in fixed:
        yield (np.frombuffer(t, dtype=np.uint8), np.frombuffer(q, dtype=np.uint8))

    for k in range(n_random):
        tlen = int(rng.integers(1, 400))
        t = _rand_seq(rng, tlen, with_n=(k % 7 == 0))
        mode = k % 4
        if mode == 0:  # mutated copy (typical ref/alt haplotype pair)
            q = _mutate(rng, t)
        elif mode == 1:  # substring with mutations
            lo = int(rng.integers(0, max(1, tlen // 2)))
            hi = int(rng.integers(lo + 1, tlen + 1))
            q = _mutate(rng, t[lo:hi], sub_rate=0.03)
        elif mode == 2:  # unrelated
            q = _rand_seq(rng, int(rng.integers(1, 300)))
        else:  # query longer than target (overhangs)
            q = np.concatenate([
                _rand_seq(rng, int(rng.integers(0, 30))),
                _mutate(rng, t),
                _rand_seq(rng, int(rng.integers(0, 30))),
            ])
        if len(q) == 0:
            q = np.array([65], dtype=np.uint8)
        yield (t, q)


def pairhmm_cases(seed=1, n_random=120):
    """Yield dicts: hap, read bases + 4 qual tracks (uint8)."""
    rng = np.random.default_rng(seed)
    for k in range(n_random):
        haplen = int(rng.integers(10, 350))
        hap = _rand_seq(rng, haplen, with_n=(k % 9 == 0))
        if k % 3 == 0:
            rdlen = int(rng.integers(5, max(6, haplen)))
            lo = int(rng.integers(0, max(1, haplen - rdlen)))
            rd = _mutate(rng, hap[lo:lo + rdlen], sub_rate=0.02, indel_rate=0.01)
        else:
            rd = _rand_seq(rng, int(rng.integers(5, 180)), with_n=(k % 11 == 0))
        n = len(rd)
        q = rng.integers(6, 50, size=n).astype(np.uint8)
        if k % 5 == 0:  # extreme quals to push toward float underflow
            q = rng.integers(35, 64, size=n).astype(np.uint8)
        i = rng.integers(20, 55, size=n).astype(np.uint8)
        d = rng.integers(20, 55, size=n).astype(np.uint8)
        c = np.full(n, 10, dtype=np.uint8)  # GATK passes constant GCP
        yield dict(hap=hap, bases=rd, q=q, i=i, d=d, c=c)

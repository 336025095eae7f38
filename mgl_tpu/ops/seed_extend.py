"""Seed-extend fast-path scorer (tier-0 prefilter).

Vectorized re-derivation of the reference's dormant heuristic
(``/root/reference/src/main/native/mgl_pairhmm/compute_fast_prob.cc`` — not
wired in there, built active here per BASELINE.json "seed-extend scoring"):

For each hap offset p, the read either matches exactly (contributes the
all-match path probability ``resultMatch``) or diverges at exactly one
position pos0 with the remainder matching (contributes
``resultMatch * distN(q[pos0]) / distM(q[pos0])``).  Score = sum over
offsets / haplen.

Pairs whose fast score clears MIN_ACCEPTED can skip the full DP entirely
(the reference JNI driver's tier-0 gate,
com_microsoft_mgl_pairhmm_MicrosoftPairHmm.cc:145-159).  This changes
results for well-matching pairs (it is a different estimator), so the
engine exposes it as an opt-in mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mgl_tpu.core.context import CTX_F32

AMBIG = ord("N")


def result_match(read: dict) -> np.float32:
    """All-match path probability (compute_fast_prob.cc:15-30), f32 with the
    reference's exact sequential multiply order."""
    q = np.asarray(read["q"], np.uint8) & 127
    i = np.asarray(read["i"], np.uint8) & 127
    d = np.asarray(read["d"], np.uint8) & 127
    c = np.asarray(read["c"], np.uint8) & 127
    ph = CTX_F32.ph2pr
    one = np.float32(1.0)
    rm = np.float32((one - ph[q[0]]) * (one - ph[c[0]]) * CTX_F32.initial_constant)
    if len(q) > 1:
        dist_m = (one - ph[q[1:]]).astype(np.float32)
        p_mm = CTX_F32.set_mm_prob(i[1:], d[1:]).astype(np.float32)
        factors = (dist_m * p_mm).astype(np.float32)
        rm = np.float32(rm * np.cumprod(factors, dtype=np.float32)[-1])
    return rm


@functools.partial(jax.jit, static_argnames=())
def _fast_scores_device(
    hap,        # (B, H) int32
    haplen,     # (B,) int32
    rchar,      # (B, R) int32 (read bases, index 0 = base 0)
    rslen,      # (B,) int32
    corr,       # (B, R) f32: distN/distM correction per read position
    rm,         # (B,) f32 resultMatch
):
    B, H = hap.shape
    R = rchar.shape[1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
    read_valid = r_iota < rslen[:, None]
    hpad = jnp.pad(hap, ((0, 0), (0, R)))

    def step(acc, p):
        win = jax.lax.dynamic_slice_in_dim(hpad, p, R, axis=1)
        mm = (rchar != win) & (rchar != AMBIG) & (win != AMBIG) & read_valid
        n_mm = jnp.sum(mm.astype(jnp.int32), axis=1)
        pos0 = jnp.argmax(mm, axis=1)
        corr0 = jnp.take_along_axis(corr, pos0[:, None], axis=1)[:, 0]
        contrib = jnp.where(
            n_mm == 0, rm,
            jnp.where(n_mm == 1, rm * corr0, 0.0),
        )
        valid = (p <= haplen - rslen)
        return acc + jnp.where(valid, contrib, 0.0), None

    acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32),
                          jnp.arange(H, dtype=jnp.int32))
    return acc / haplen.astype(jnp.float32)


def fast_scores(reads: list[dict], haps: list[np.ndarray],
                pair_index: list[tuple[int, int]]) -> np.ndarray:
    """Fast-path scores for each (read, hap) pair.  Returns (B,) f32,
    INITIAL_CONSTANT-scaled like the full kernel."""
    B = len(pair_index)
    rmax = max(len(reads[ri]["bases"]) for ri, _ in pair_index)
    hmax = max(len(haps[hi]) for _, hi in pair_index)

    ph = CTX_F32.ph2pr
    one = np.float32(1.0)
    third = np.float32(1.0) / np.float32(3.0)

    rm_cache, corr_cache = {}, {}
    for ri in {ri for ri, _ in pair_index}:
        rd = reads[ri]
        rm_cache[ri] = result_match(rd)
        q = np.asarray(rd["q"], np.uint8) & 127
        dist = ph[q].astype(np.float32)
        corr_cache[ri] = ((dist * third) / (one - dist)).astype(np.float32)

    hap_b = np.zeros((B, hmax), np.int32)
    haplen = np.zeros(B, np.int32)
    rchar = np.zeros((B, rmax), np.int32)
    rslen = np.zeros(B, np.int32)
    corr = np.zeros((B, rmax), np.float32)
    rm = np.zeros(B, np.float32)
    for b, (ri, hi) in enumerate(pair_index):
        rd, hp = reads[ri], haps[hi]
        hap_b[b, : len(hp)] = hp
        haplen[b] = len(hp)
        rchar[b, : len(rd["bases"])] = rd["bases"]
        rslen[b] = len(rd["bases"])
        corr[b, : len(rd["bases"])] = corr_cache[ri]
        rm[b] = rm_cache[ri]

    return np.asarray(
        _fast_scores_device(
            jnp.asarray(hap_b), jnp.asarray(haplen), jnp.asarray(rchar),
            jnp.asarray(rslen), jnp.asarray(corr), jnp.asarray(rm),
        )
    )

"""Batched PairHMM forward pass (JAX) with precision cascade.

TPU-first redesign of the reference PairHMM kernels
(``/root/reference/src/main/native/mgl_pairhmm/compute_prob_scalar.cc``
recurrence; ``compute_prob_avxf.cc`` production float kernel;
``com_microsoft_mgl_pairhmm_MicrosoftPairHmm.cc:131-215`` tier driver).

Design:

* **Inter-pair vectorization** across the 8x128 VPU: each (read, haplotype)
  pair occupies one lane-column of the wavefront state; the reference
  instead packs 8 rows of ONE pair into AVX lanes.
* **Anti-diagonal sweep** with two carried diagonals, recurrence pinned to
  the reference's op shape (compute_prob_scalar.cc:39-43):
      M = distm * (M_d2 * pMM + (X_d2 + Y_d2) * pGapM)
      X = M_d1[r-1] * pMX + X_d1[r-1] * pZZ
      Y = M_d1[r]   * pMY + Y_d1[r]   * pZZ
* **Transition/emission rows precomputed on host** (core/context.py) from
  the canonical bit-exact tables, so device work is pure FMA-shaped f32.
* **Precision cascade**: f32 on device; pairs whose scaled score falls
  below MIN_ACCEPTED (1e-28) are recomputed on device in extended-range
  double-float arithmetic (ops/xfloat.py — the TPU-native equivalent of
  the reference's f64 rescue kernel, pairhmm_common.h:31 tiering); a host
  C++ f64 kernel remains as an opt-in fallback (MGL_TPU_RESCUE=native).

Scaling follows Context<float>: yInitial = 2^120 / haplen, final
likelihood = log10(score) - log10(2^120).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mgl_tpu.core.context import (
    CTX_F32,
    CTX_F64,
    MIN_ACCEPTED,
    read_transition_rows,
)

AMBIG = ord("N")

# One alphabet for every kernel tier (pallas one-hot, XLA spec, rescue):
# uppercase ACGT; IUPAC codes / lowercase / junk -> N.  Applied at
# compute_likelihoods so direct callers and the api layer see identical
# scores (the reference only ever receives ACGTN from GATK).
BASE_NORM = np.full(256, AMBIG, np.uint8)
for _c in b"ACGT":
    BASE_NORM[_c] = _c
    BASE_NORM[_c + 32] = _c


class PairHMMBatch(NamedTuple):
    """Device-ready padded batch of (read, hap) pairs.

    All arrays have leading dim B (pairs).  R = padded read rows + 1,
    H = padded hap length.
    """

    hap: np.ndarray        # (B, H) int32 ASCII
    haplen: np.ndarray     # (B,) int32
    rchar: np.ndarray      # (B, R) int32 ASCII, rchar[:, r] = read base r-1
    rslen: np.ndarray      # (B,) int32
    p_mm: np.ndarray       # (B, R) f32
    p_gapm: np.ndarray
    p_mx: np.ndarray
    p_my: np.ndarray
    p_zz: np.ndarray
    distm_match: np.ndarray  # (B, R) f32: 1 - ph2pr[q]
    distm_mis: np.ndarray    # (B, R) f32: ph2pr[q] / 3
    y_init: np.ndarray       # (B,) f32: 2^120 / haplen


def compute_haplotype_similarities(
    haps: list[np.ndarray],
) -> tuple[np.ndarray, int, int]:
    """Shared-prefix structure of consecutive haplotypes.

    Re-derivation of the reference's computeHaplotypeSimilarities
    (pairhmm_common.cc:3-63): position[j] is the even-rounded length of the
    prefix hap[j] shares with hap[j-1], reset to 0 when the predecessor is
    shorter than 8 bases or shares less than its own recorded prefix; also
    returns (cols_min, cols_max) over haplotype lengths.

    The reference uses position[] to resume each haplotype's DP from a
    cached column state (compute_prob_avxf.cc:943-967).  Here the same
    structure drives (a) exact-duplicate haplotype deduplication in
    compute_likelihoods, and (b) the prefix-sharing shared-hap-set kernel
    (kernels/pairhmm_pallas.pairhmm_pallas_shared), whose checkpointed
    wavefront restore is the TPU realization of that column cache.
    """
    n = len(haps)
    positions = np.zeros(n, dtype=np.int64)
    if n == 0:
        return positions, 0, 0
    cols_min = cols_max = len(haps[0])
    for j in range(1, n):
        prev, cur = np.asarray(haps[j - 1]), np.asarray(haps[j])
        pos = 0
        if len(prev) >= 8:
            common = min(len(prev), len(cur))
            neq = np.nonzero(prev[:common] != cur[:common])[0]
            pos = int(neq[0]) if neq.size else common
            pos -= pos % 2
            if pos < positions[j - 1]:
                pos = 0
        positions[j] = pos
        cols_min = min(cols_min, len(cur))
        cols_max = max(cols_max, len(cur))
    return positions, cols_min, cols_max


def pack_pairs(
    reads: list[dict],
    haps: list[np.ndarray],
    pair_index: list[tuple[int, int]] | None = None,
    pad_to: tuple[int, int] | None = None,
) -> PairHMMBatch:
    """Pack (read, hap) pairs into padded arrays.

    ``reads``: dicts with uint8 arrays bases/q/i/d/c (the packed-buffer
    layout of MicrosoftPairHmm.java:90-97, one dict per read).
    ``pair_index``: list of (read_idx, hap_idx); defaults to the full
    reads x haps product in row-major order (JNI driver semantics).
    ``pad_to``: (read_pad, hap_pad) bucket dims for compiled-shape reuse;
    defaults to the batch maxima.  Padding is inert (zero transition rows,
    column-gated accumulation), so scores are pad-invariant.
    """
    if pair_index is None:
        pair_index = [(ri, hi) for ri in range(len(reads)) for hi in range(len(haps))]
    B = len(pair_index)
    rmax = max(len(reads[ri]["bases"]) for ri, _ in pair_index)
    hmax = max(len(haps[hi]) for _, hi in pair_index)
    if pad_to is not None:
        if pad_to[0] < rmax or pad_to[1] < hmax:
            raise ValueError(f"pad_to {pad_to} < batch maxima ({rmax}, {hmax})")
        rmax, hmax = pad_to
    R = rmax + 1

    # Per-UNIQUE-read/hap staging + per-pair fancy-index gather: the loops
    # below run over distinct reads/haps only (a full product touches each
    # once), and the B-sized expansion is vectorized numpy — the per-pair
    # Python loop this replaces dominated engine host time at GATK region
    # shapes (B = n_r * n_h pairs from n_r + n_h sequences).
    ur = sorted({ri for ri, _ in pair_index})
    uh = sorted({hi for _, hi in pair_index})
    rmap = {ri: k for k, ri in enumerate(ur)}
    hmap = {hi: k for k, hi in enumerate(uh)}

    hap_stack = np.zeros((len(uh), hmax), np.int32)
    haplen_u = np.zeros(len(uh), np.int32)
    for k, hi in enumerate(uh):
        hp = haps[hi]
        hap_stack[k, : len(hp)] = hp
        haplen_u[k] = len(hp)

    # 7 transition/emission planes + rchar, one row per unique read; the
    # quality tracks are stacked once and read_transition_rows runs ONE
    # batched table-lookup pass (it accepts any leading batch shape) —
    # per-element values are identical to per-read calls, and columns
    # past each read's length are masked back to the zero padding the
    # kernels' pad-invariance requires
    nq = len(ur)
    qs = np.zeros((4, nq, rmax), np.uint8)
    rchar_u = np.zeros((nq, R), np.int32)
    rslen_u = np.zeros(nq, np.int32)
    for k, ri in enumerate(ur):
        rd = reads[ri]
        n = len(rd["bases"])
        qs[0, k, :n] = rd["q"]
        qs[1, k, :n] = rd["i"]
        qs[2, k, :n] = rd["d"]
        qs[3, k, :n] = rd["c"]
        rchar_u[k, 1: n + 1] = rd["bases"]
        rslen_u[k] = n
    t = read_transition_rows(qs[0], qs[1], qs[2], qs[3], CTX_F32)
    one = np.float32(1.0)
    third = np.float32(1.0) / np.float32(3.0)
    plane_u = np.empty((nq, 7, R), np.float32)
    for j in range(5):
        plane_u[:, j] = t[j]
    distm = t[5]
    plane_u[:, 5] = one - distm
    plane_u[:, 6] = distm * third
    plane_u *= (np.arange(R) <= rslen_u[:, None])[:, None, :]

    ridx = np.fromiter((rmap[ri] for ri, _ in pair_index), np.int64, B)
    hidx = np.fromiter((hmap[hi] for _, hi in pair_index), np.int64, B)
    planes = plane_u[ridx]                      # (B, 7, R)
    return PairHMMBatch(
        hap=hap_stack[hidx],
        haplen=haplen_u[hidx],
        rchar=rchar_u[ridx],
        rslen=rslen_u[ridx],
        p_mm=planes[:, 0],
        p_gapm=planes[:, 1],
        p_mx=planes[:, 2],
        p_my=planes[:, 3],
        p_zz=planes[:, 4],
        distm_match=planes[:, 5],
        distm_mis=planes[:, 6],
        y_init=(np.float32(CTX_F32.initial_constant)
                / haplen_u[hidx].astype(np.float32)),
    )


from mgl_tpu.utils import shift_down as _shift_down  # shared



@jax.jit
def pairhmm_forward_f32(
    hap: jax.Array, haplen: jax.Array,
    rchar: jax.Array, rslen: jax.Array,
    p_mm: jax.Array, p_gapm: jax.Array, p_mx: jax.Array,
    p_my: jax.Array, p_zz: jax.Array,
    distm_match: jax.Array, distm_mis: jax.Array,
    y_init: jax.Array,
) -> jax.Array:
    """Batched forward probability, f32, INITIAL_CONSTANT-scaled.

    Returns (B,) scores = sum over the last read row of (M + X) across all
    hap columns (compute_prob_scalar.cc:211,313).
    """
    B, R = rchar.shape
    H = hap.shape[1]
    D = R + H            # diagonals 0 .. R-1+H

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
    hpad = jnp.pad(hap, ((0, 0), (0, R + 1)))
    y_init_col = y_init[:, None]
    rl = rslen.astype(jnp.int32)[:, None]
    hl = haplen.astype(jnp.int32)[:, None]

    zero = jnp.zeros((B, R), jnp.float32)
    # diag 0: element 0 = cell (0,0): M=X=0, Y=yInit
    m_prev2, x_prev2 = zero, zero
    y_prev2 = zero.at[:, 0].set(y_init)
    # diag 1: element 0 = (0,1): Y=yInit; element 1 = (1,0): zeros
    m_prev, x_prev = zero, zero
    y_prev = zero.at[:, 0].set(y_init)
    hapdiag = jnp.zeros((B, R), jnp.int32).at[:, 0].set(hpad[:, 0])

    def step(carry, d):
        m_prev, x_prev, y_prev, m_prev2, x_prev2, y_prev2, hapdiag, acc = carry

        hch = jax.lax.dynamic_slice_in_dim(hpad, d - 1, 1, axis=1)
        hapdiag = _shift_down(hapdiag, 0).at[:, 0].set(hch[:, 0])

        is_match = (rchar == hapdiag) | (rchar == AMBIG) | (hapdiag == AMBIG)
        distm = jnp.where(is_match, distm_match, distm_mis)

        m_d2 = _shift_down(m_prev2, 0.0)
        x_d2 = _shift_down(x_prev2, 0.0)
        y_d2 = _shift_down(y_prev2, 0.0)
        m_cur = distm * (m_d2 * p_mm + (x_d2 + y_d2) * p_gapm)

        y_cur = m_prev * p_my + y_prev * p_zz

        m_d1 = _shift_down(m_prev, 0.0)
        x_d1 = _shift_down(x_prev, 0.0)
        x_cur = m_d1 * p_mx + x_d1 * p_zz

        # boundaries: element 0 = row 0 (M=X=0, Y=yInit); element d = col 0 (zeros)
        row0 = r_iota == 0
        col0 = r_iota == d
        m_cur = jnp.where(row0 | col0, 0.0, m_cur)
        x_cur = jnp.where(row0 | col0, 0.0, x_cur)
        y_cur = jnp.where(col0, 0.0, jnp.where(row0, y_init_col, y_cur))

        # last-row contribution: cell (rslen, c=d-rslen), valid 1 <= c <= haplen
        mv = jnp.take_along_axis(m_cur, rl, axis=1)[:, 0]
        xv = jnp.take_along_axis(x_cur, rl, axis=1)[:, 0]
        c = d - rl[:, 0]
        valid = (c >= 1) & (c <= hl[:, 0])
        acc = acc + jnp.where(valid, mv + xv, 0.0)

        return (m_cur, x_cur, y_cur, m_prev, x_prev, y_prev, hapdiag, acc), None

    acc0 = jnp.zeros((B,), jnp.float32)
    carry0 = (m_prev, x_prev, y_prev, m_prev2, x_prev2, y_prev2, hapdiag, acc0)
    ds = jnp.arange(2, D, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, carry0, ds)
    return final[-1]


def _pairhmm_fits_vmem(rdlen: int, haplen: int,
                       budget_mb: float = 12.0) -> bool:
    """Whether the banded PairHMM kernel's working set (9 transition/char
    planes + hap rows + 4 carry columns) fits VMEM; oversized long-read
    buckets stream (see _pairhmm_fits_stream) or fall back to XLA."""
    rb = (rdlen + 31) // 32 * 32
    hr = haplen + 40
    est = (9 * rb + hr + 4 * hr + 256) * 128 * 4
    return est <= budget_mb * 1e6


def _pairhmm_fits_stream(rdlen: int, haplen: int,
                         budget_mb: float = 14.0) -> bool:
    """Envelope of the HBM-streaming banded kernel: read length drops out
    (transition planes stream per band); the carry is hap-length bound."""
    hr = haplen + 40
    est = (hr + 4 * hr + 9 * 2 * 32 + 256) * 128 * 4
    return est <= budget_mb * 1e6


def _use_pallas(impl: str) -> bool:
    import os

    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    if os.environ.get("MGL_TPU_IMPL") in ("xla", "lax"):
        return False
    return jax.default_backend() == "tpu"


def forward_scores_xla(batch: PairHMMBatch) -> np.ndarray:
    """f32 scores via the lax.scan fallback (CPU/GPU or debugging)."""
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


def _raw_even_prefixes(haps: list[np.ndarray]) -> np.ndarray:
    """Even-rounded shared-prefix length of each hap with its
    predecessor, BEFORE the monotonic reset rule (raw[j] = 0 when the
    predecessor is shorter than 8 bases) — the input both
    compute_haplotype_similarities and chunk-local position replays
    derive from."""
    n = len(haps)
    raw = np.zeros(n, np.int64)
    for j in range(1, n):
        prev, cur = np.asarray(haps[j - 1]), np.asarray(haps[j])
        if len(prev) < 8:
            continue
        common = min(len(prev), len(cur))
        neq = np.nonzero(prev[:common] != cur[:common])[0]
        pos = int(neq[0]) if neq.size else common
        raw[j] = pos - pos % 2
    return raw


def _shared_hap_chunks(haps: list[np.ndarray], rdlen: int,
                       band: int = 32,
                       budget: float = 13e6) -> list[tuple[int, int]]:
    """Split the hap list into contiguous chunks whose shared-kernel
    working set (dominated by the stream-indexed carry array) fits VMEM.

    Budgets with CHUNK-LOCAL share positions (the positions
    forward_scores_shared will recompute for each chunk): the reset rule
    is relative to the previous hap's position, so full-list positions
    can UNDER-estimate a chunk's stream — a hap that kept its prefix in
    the full list can reset to 0 chunk-locally, lengthening the real
    stream past a raw-estimate bucket boundary and blowing scoped VMEM."""
    from mgl_tpu.kernels.pairhmm_pallas import shared_vmem_bytes

    raw = _raw_even_prefixes(haps)
    chunks: list[tuple[int, int]] = []
    lo, stream, prev_pos = 0, 0, 0
    for j, h in enumerate(haps):
        pos_l = 0 if j == lo else (int(raw[j])
                                   if raw[j] >= prev_pos else 0)
        seg = len(h) - pos_l
        if (j > lo and shared_vmem_bytes(rdlen, stream + seg, j - lo + 1,
                                         band) > budget):
            chunks.append((lo, j))
            lo, stream, prev_pos = j, len(h), 0
        else:
            stream += seg
            prev_pos = pos_l
    chunks.append((lo, len(haps)))
    return chunks


def _shared_product_scores(reads: list[dict], haps: list[np.ndarray],
                           band: int = 32, async_result: bool = False):
    """(n_r, n_h) scores via the prefix-sharing shared-hap-set kernel, or
    None when the plain per-pair product layout is estimated cheaper
    (small read sets leave VPU lanes idle in shared mode).

    This is the TPU realization of the reference's haplotype column cache
    (compute_prob_avxf.cc:943-967): scores are the avxf variant (shared
    yInitial + final rescale), within the 1e-5 log10 contract of the
    scalar spec.
    """
    import math
    import os

    from mgl_tpu.batch.bucketing import bucket_dims
    from mgl_tpu.kernels.pairhmm_pallas import (LANES,
                                                forward_scores_shared)

    if os.environ.get("MGL_TPU_SHARED", "1") == "0":
        return None
    n_r, n_h = len(reads), len(haps)
    positions, _, _ = compute_haplotype_similarities(haps)
    stream = sum(len(h) - int(p) for h, p in zip(haps, positions))
    total = sum(len(h) for h in haps)

    buckets: dict[int, list[int]] = {}
    for i, rd in enumerate(reads):
        buckets.setdefault(bucket_dims(len(rd["bases"])), []).append(i)
    hap_cols = total / n_h + band
    work_shared = sum(math.ceil(len(g) / LANES)
                      * (stream + n_h * (band - 1))
                      for g in buckets.values())
    work_product = sum(math.ceil(len(g) * n_h / LANES) * hap_cols
                       for g in buckets.values())
    if work_shared > 0.9 * work_product:
        return None

    cols_max = max(len(h) for h in haps)
    # all kernels dispatch first (device queue fills), fetches happen in
    # finish() — lets a pipelined caller overlap the next batch's host
    # packing with this batch's device time
    pending = []
    for pa, ridx in sorted(buckets.items()):
        sub_reads = [reads[i] for i in ridx]
        for lo, hi in _shared_hap_chunks(haps, pa, band):
            fin = forward_scores_shared(sub_reads, haps[lo:hi], band=band,
                                        pad_rdlen=pa, cols_max=cols_max,
                                        async_result=True)
            pending.append((fin, ridx, lo, hi))

    def finish() -> np.ndarray:
        out = np.zeros((n_r, n_h), np.float64)
        for fin, ridx, lo, hi in pending:
            out[np.asarray(ridx)[:, None],
                np.arange(lo, hi)[None, :]] = fin()
        return out

    if async_result:
        return finish
    return finish()


def rescue_tier_scores(reads: list[dict], haps: list[np.ndarray],
                       pairs: list[tuple[int, int]],
                       async_result: bool = False):
    """Extended-range (f64-class) scores for the rescue tail.

    Default: the on-device xfloat kernel (ops/xfloat.py) — the TPU-native
    equivalent of the reference's compute_prob_avxd.cc rescue tier.
    MGL_TPU_RESCUE selects a fallback: 'native' = host C++ threaded f64
    kernel, 'scalar' = NumPy oracle.  Returns (B,) float64 scaled scores
    (with ``async_result``: a closure producing them — device kernels are
    dispatched, fetches deferred for pipelined callers).
    """
    import os

    from mgl_tpu.ref_impl.pairhmm_scalar import compute_score

    mode = os.environ.get("MGL_TPU_RESCUE", "xf")
    if mode == "native":
        from mgl_tpu.native import pairhmm_f64_rescue

        native = pairhmm_f64_rescue(reads, haps, pairs)
        if native is not None:
            out = np.asarray(native, np.float64)
            return (lambda: out) if async_result else out
        mode = "scalar"  # pragma: no cover - lib unavailable
    if mode == "scalar":
        out = np.zeros(len(pairs), np.float64)
        for k, (ri, hi) in enumerate(pairs):
            rd = reads[ri]
            out[k] = compute_score(haps[hi], rd["bases"], rd["q"], rd["i"],
                                   rd["d"], rd["c"], ctx=CTX_F64)
        return (lambda: out) if async_result else out

    from mgl_tpu.batch.bucketing import bucket_pairs
    from mgl_tpu.kernels.pairhmm_xf_pallas import (_xf_fits_stream,
                                                   _xf_fits_vmem,
                                                   rescue_scores_xf_banded)
    from mgl_tpu.ops.xfloat import rescue_scores_xf

    use_pallas = _use_pallas("auto") and mode != "xf-scan"
    la = [len(reads[ri]["bases"]) for ri, _ in pairs]
    lb = [len(haps[hi]) for _, hi in pairs]
    pending = []
    for (pa, pb), idxs in bucket_pairs(la, lb):
        if use_pallas:
            # banded Pallas xfloat kernel at every length — same tiers as
            # the f32 production kernel (vmem -> stream -> stream_carry);
            # the XLA scan below stays as the any-shape executable spec
            fits = _xf_fits_vmem(pa, pb)
            streamable = fits or _xf_fits_stream(pa, pb)
            fin = rescue_scores_xf_banded(reads, haps,
                                          [pairs[k] for k in idxs],
                                          pad_to=(pa, pb),
                                          stream=not fits,
                                          stream_carry=not streamable,
                                          async_result=True)
        else:
            sub = rescue_scores_xf(reads, haps, [pairs[k] for k in idxs],
                                   pad_to=(pa, pb))
            fin = (lambda s=sub: s)
        pending.append((fin, idxs))

    def finish() -> np.ndarray:
        out = np.zeros(len(pairs), np.float64)
        for fin, idxs in pending:
            out[np.asarray(idxs)] = fin()
        return out

    if async_result:
        return finish
    return finish()


def compute_likelihoods(
    reads: list[dict],
    haps: list[np.ndarray],
    use_double: bool = False,
    use_fast_path: bool = False,
    impl: str = "auto",
) -> np.ndarray:
    """Full cascade: optional seed-extend tier-0, device f32 pass, f64
    rescue below 1e-28.

    Returns (num_reads, num_haps) float64 log10 likelihoods, matching
    MicrosoftPairHmm.computeLikelihoods output layout.  ``use_fast_path``
    activates the seed-extend prefilter the reference ships dormant
    (com_microsoft_mgl_pairhmm_MicrosoftPairHmm.cc:140-143): well-matching
    pairs take the fast estimator's score and skip the DP.
    """
    reads = [{**rd, "bases": BASE_NORM[np.asarray(rd["bases"], np.uint8)]}
             for rd in reads]
    haps = [BASE_NORM[np.asarray(h, np.uint8)] for h in haps]
    n_r, n_h = len(reads), len(haps)
    out = np.zeros((n_r, n_h), dtype=np.float64)

    # exact-duplicate haplotype dedup (the TPU-shaped payoff of the
    # reference's haplotype-similarity pass, see
    # compute_haplotype_similarities): identical haplotypes score
    # identically against every read, so compute each distinct one once.
    canon: dict[bytes, int] = {}
    hap_to_canon = np.empty(n_h, dtype=np.int64)
    uniq_idx: list[int] = []
    for hi, hp in enumerate(haps):
        key = np.asarray(hp).tobytes()
        if key in canon:
            hap_to_canon[hi] = canon[key]
        else:
            canon[key] = hi
            hap_to_canon[hi] = hi
            uniq_idx.append(hi)
    if len(uniq_idx) < n_h:
        sub = compute_likelihoods([reads[r] for r in range(n_r)],
                                  [haps[h] for h in uniq_idx],
                                  use_double, use_fast_path, impl)
        col_of = {hi: k for k, hi in enumerate(uniq_idx)}
        for hi in range(n_h):
            out[:, hi] = sub[:, col_of[int(hap_to_canon[hi])]]
        return out

    pair_index = [(ri, hi) for ri in range(n_r) for hi in range(n_h)]
    fast_hit: dict[int, float] = {}
    if use_fast_path and not use_double:
        from mgl_tpu.ops.seed_extend import fast_scores

        fs = fast_scores(reads, haps, pair_index)
        fast_hit = {b: float(fs[b]) for b in range(len(pair_index))
                    if fs[b] >= float(MIN_ACCEPTED)}

    dp_pairs = [b for b in range(len(pair_index)) if b not in fast_hit]
    scores = np.full(len(pair_index), -1.0, dtype=np.float64)
    for b, s in fast_hit.items():
        scores[b] = s
    if not use_double and dp_pairs:
        from mgl_tpu.batch.bucketing import bucket_pairs

        use_pallas = _use_pallas(impl)
        # full-product batches ride the prefix-sharing shared-hap-set
        # kernel when the work estimate favors it (GATK's call shape)
        from mgl_tpu.utils.metrics import METRICS

        shared = None
        if (use_pallas and not fast_hit and n_h >= 2
                and len(dp_pairs) == n_r * n_h):
            with METRICS.timer("engine.f32"):
                shared = _shared_product_scores(reads, haps)
        if shared is not None:
            scores[dp_pairs] = shared.reshape(-1)[dp_pairs]
            dp_pairs = []
        # length-bucket by (read, hap) pad shape so mixed-length products
        # don't all pay the global maxima (and compiled shapes get reused)
        la = [len(reads[pair_index[b][0]]["bases"]) for b in dp_pairs]
        lb = [len(haps[pair_index[b][1]]) for b in dp_pairs]
        for (pa, pb), idxs in bucket_pairs(la, lb):
            sel = [dp_pairs[k] for k in idxs]
            sub_pairs = [pair_index[b] for b in sel]
            fits = _pairhmm_fits_vmem(pa, pb)
            streamable = not fits and _pairhmm_fits_stream(pa, pb)
            from mgl_tpu.utils.logging import get_logger

            get_logger("engine").debug(
                "pairhmm bucket (%d, %d) x%d -> %s", pa, pb, len(idxs),
                ("pallas" + ("" if fits else
                             "+stream" if streamable else
                             "+stream_carry")) if use_pallas else "xla")
            if use_pallas:
                # device-side product expansion: ship per-read/per-hap
                # planes once, gather per-pair lanes on device; long
                # reads stream their transition planes HBM->VMEM, and
                # long *haps* also stream the carry + hap planes
                # (stream_carry) — no length falls back to XLA
                from mgl_tpu.kernels.pairhmm_pallas import (
                    forward_scores_product)

                ur = sorted({ri for ri, _ in sub_pairs})
                uh = sorted({hi for _, hi in sub_pairs})
                rmap = {r: k for k, r in enumerate(ur)}
                hmap = {h: k for k, h in enumerate(uh)}
                sub = forward_scores_product(
                    [reads[r] for r in ur], [haps[h] for h in uh],
                    [(rmap[ri], hmap[hi]) for ri, hi in sub_pairs],
                    stream=not fits,
                    stream_carry=not (fits or streamable))
            else:
                batch = pack_pairs(reads, haps, sub_pairs, pad_to=(pa, pb))
                sub = forward_scores_xla(batch)
            scores[np.asarray(sel, np.int64)] = np.asarray(sub, np.float64)

    return _finish_scores(scores, reads, haps, n_r, n_h, out)


def _finish_scores_start(scores: np.ndarray, reads: list[dict],
                         haps: list[np.ndarray], n_r: int, n_h: int,
                         out: np.ndarray):
    """log10 conversion + underflow-rescue DISPATCH over full-product f32
    scores (flat layout b = ri * n_h + hi).  Returns a closure that
    fetches the rescue results and returns the finished matrix — the
    cascade tail, split so pipelined callers overlap the rescue kernels
    of batch k with the packing of batch k+1."""
    lic32 = float(CTX_F32.log10_initial_constant)
    lic64 = float(CTX_F64.log10_initial_constant)

    rescue = np.nonzero(scores < float(MIN_ACCEPTED))[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        out[:] = (np.log10(scores) - lic32).reshape(n_r, n_h)
    if not len(rescue):
        return lambda: out
    from mgl_tpu.utils.metrics import METRICS

    with METRICS.timer("engine.rescue"):
        fetch = rescue_tier_scores(
            reads, haps, [(int(b) // n_h, int(b) % n_h) for b in rescue],
            async_result=True)

    def apply() -> np.ndarray:
        with METRICS.timer("engine.rescue"):
            vals = fetch()
        flat = out.reshape(-1)
        flat[rescue] = np.log10(np.asarray(vals, np.float64)) - lic64
        return out

    return apply


def _finish_scores(scores: np.ndarray, reads: list[dict],
                   haps: list[np.ndarray], n_r: int, n_h: int,
                   out: np.ndarray) -> np.ndarray:
    """Synchronous cascade tail (see _finish_scores_start)."""
    return _finish_scores_start(scores, reads, haps, n_r, n_h, out)()


def dispatch_likelihoods(reads: list[dict], haps: list[np.ndarray],
                         use_double: bool = False,
                         use_fast_path: bool = False,
                         impl: str = "auto"):
    """Async form of compute_likelihoods for pipelined batch streams.

    Dispatches the f32 device pass and returns a ``finalize`` closure;
    calling it fetches the scores and runs the rescue tail.  While the
    device works on this batch, the caller packs and dispatches the next
    one — the single-threaded latency-hiding pattern of
    pipelines/mapper.map_reads_stream (worker threads contend on the
    device transport; an explicit dispatch/finalize split does not).

    Configurations outside the common full-product shape (use_double,
    fast_path, duplicate haplotypes, non-Pallas impl, or hap sets the
    shared-kernel work estimate rejects) complete synchronously here and
    finalize is a no-op — results are identical to compute_likelihoods
    in every case.
    """
    norm_reads = [{**rd,
                   "bases": BASE_NORM[np.asarray(rd["bases"], np.uint8)]}
                  for rd in reads]
    norm_haps = [BASE_NORM[np.asarray(h, np.uint8)] for h in haps]
    n_r, n_h = len(norm_reads), len(norm_haps)
    eligible = (not use_double and not use_fast_path and n_h >= 2
                and _use_pallas(impl)
                and len({np.asarray(h).tobytes() for h in norm_haps}) == n_h)
    fin = (_shared_product_scores(norm_reads, norm_haps, async_result=True)
           if eligible else None)
    if fin is None:
        out = compute_likelihoods(reads, haps, use_double, use_fast_path,
                                  impl)
        return lambda: (lambda: out)

    def step1():
        """Fetch the f32 scores and dispatch the rescue kernels; returns
        the closure that fetches the rescue and yields the matrix."""
        from mgl_tpu.utils.metrics import METRICS

        with METRICS.timer("engine.f32"):
            scores = fin().reshape(-1)
        out = np.zeros((n_r, n_h), np.float64)
        return _finish_scores_start(scores, norm_reads, norm_haps,
                                    n_r, n_h, out)

    return step1

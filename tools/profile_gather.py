"""Microbenchmark: the mapper's device window gather vs reference size.

The 512 Mbp scale run showed map.dispatch blowing up 4x vs 64 Mbp
(scale_report.json stage_s) with the SAME read count and the SAME flat
gather code path (512 Mbp < _BLOCK_GATE).  This isolates where that time
goes: (a) the XLA row gather from a flat ref, (b) the blocked (row,
offset) 2-level gather, (c) the gather with batch starts pre-sorted
(locality), each with and without the downstream banded SW kernel.

Usage: python tools/profile_gather.py [--mbp 64 512] [--lanes 131072]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(ref_mbp: float, lanes: int, wlen: int = 198, qlen: int = 150,
        iters: int = 4):
    import jax
    import jax.numpy as jnp

    from mgl_tpu.pipelines import mapper as M
    from mgl_tpu.pipelines.mapper import ReferenceIndex

    n = int(ref_mbp * 1e6)
    rng = np.random.default_rng(0)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n)
    idx = ReferenceIndex.__new__(ReferenceIndex)
    idx.ref = ref
    idx._ref_dev = None
    idx._ref_blocked = False
    starts = rng.integers(0, n - wlen, lanes).astype(np.int64)
    reads = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                       size=(lanes, qlen))

    ref_dev, blocked = M._ref_device(idx)
    packed = M._pack_codes(reads)

    @jax.jit
    def gather_flat(rd, st):
        win = rd[st[:, None] + jnp.arange(wlen, dtype=st.dtype)[None, :]]
        return win.sum(dtype=jnp.int32)

    @jax.jit
    def gather_blocked(rd2, bid, off):
        win = rd2[bid[:, None],
                  off[:, None] + jnp.arange(wlen, dtype=jnp.int32)[None, :]]
        return win.sum(dtype=jnp.int32)

    st32 = starts.astype(np.int32)
    out = {}

    def timeit(fn, *args):
        r = fn(*args)
        np.asarray(r).reshape(-1)[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            rs = [fn(*args) for _ in range(iters)]
            np.asarray(rs[-1]).reshape(-1)[:1]
            best = min(best, (time.time() - t0) / iters)
        return best * 1e3

    out["gather_flat_ms"] = timeit(gather_flat, ref_dev, jnp.asarray(st32))
    out["gather_flat_sorted_ms"] = timeit(
        gather_flat, ref_dev, jnp.asarray(np.sort(st32)))

    # blocked layout regardless of size (what >2^31 bp pays)
    S = 1 << M._BLOCK_BITS
    n_rows = -(-n // S)
    padded = np.concatenate(
        [M.encode(ref), np.full(S + M._BLOCK_OVERLAP, M._REF_PAD, np.uint8)])
    rows = np.lib.stride_tricks.as_strided(
        padded, shape=(n_rows, S + M._BLOCK_OVERLAP), strides=(S, 1))
    rd2 = jnp.asarray(np.ascontiguousarray(rows))
    bid = (starts >> M._BLOCK_BITS).astype(np.int32)
    off = (starts & (S - 1)).astype(np.int32)
    out["gather_blocked_ms"] = timeit(gather_blocked, rd2, jnp.asarray(bid),
                                      jnp.asarray(off))

    # word-packed gather candidate: 8 bp per uint32 (4-bit codes), ~26
    # aligned words per window instead of 198 single bytes; unpack +
    # per-row nibble shift on device (8 vectorized selects)
    code = M.encode(ref)
    nwords_ref = -(-n // 8)
    padded_c = np.zeros(nwords_ref * 8 + 64, np.uint8)
    padded_c[:n] = code
    padded_c[n:] = M._REF_PAD
    words = padded_c[: (nwords_ref + 8) * 8].reshape(-1, 8).astype(np.uint32)
    words = (words * (np.uint32(1) << (4 * np.arange(8, dtype=np.uint32)))
             ).sum(axis=1, dtype=np.uint32)
    words_dev = jnp.asarray(words.view(np.int32))
    nw = (wlen + 7) // 8 + 1

    @jax.jit
    def gather_words(wd, st):
        w0 = st >> 3
        s = st & 7
        w = wd[w0[:, None] + jnp.arange(nw, dtype=jnp.int32)[None, :]]
        nib = (w[:, :, None] >> (4 * jnp.arange(8, dtype=jnp.int32)
                                 )[None, None, :]) & 0xF
        flat = nib.reshape(st.shape[0], nw * 8)
        win = jnp.zeros((st.shape[0], wlen), jnp.int32)
        for k in range(8):
            win = jnp.where((s == k)[:, None], flat[:, k: k + wlen], win)
        return win.sum(dtype=jnp.int32)

    out["gather_words_ms"] = timeit(gather_words, words_dev,
                                    jnp.asarray(st32))

    # full dispatch+SW path (what map.dispatch measures per chunk)
    fn = M._windowed_scores_fn(wlen, qlen, blocked=False)
    args = (ref_dev, (jnp.asarray(st32),), jnp.asarray(packed),
            25, -50, 110, 6)
    sc, _ = fn(*args)
    np.asarray(sc[:8])           # score row only: (Bp,)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        rs = [fn(*args)[0] for _ in range(iters)]
        np.asarray(rs[-1][:8])
        best = min(best, (time.time() - t0) / iters)
    out["gather_plus_sw_ms"] = best * 1e3
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, nargs="+", default=[64, 512])
    ap.add_argument("--lanes", type=int, default=131072)
    args = ap.parse_args()
    for mbp in args.mbp:
        res = run(mbp, args.lanes)
        print(f"ref {mbp:6.0f} Mbp lanes {args.lanes}: "
              + " ".join(f"{k}={v:.1f}" for k, v in res.items()), flush=True)


if __name__ == "__main__":
    main()

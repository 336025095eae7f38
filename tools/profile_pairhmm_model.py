"""Attribution experiment for the PairHMM f32 issue model (DESIGN §5).

Measures the banded kernel at the bench shape two ways:
  prod      — the production kernel;
  no-roll   — pltpu.roll patched to identity at trace time (numerically
              wrong on purpose; same op count minus the 3 lane rolls).
The delta attributes the lane rolls' share of vector issue (measured
12%: 100 -> 114 GCUPS); the remaining spread to the VPU ceiling is the
carry I/O, hap feed and sampling ops DESIGN.md §5 enumerates.

Usage: python tools/profile_pairhmm_model.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def stage(B=32768, rdlen=150, haplen=400):
    import jax.numpy as jnp

    from mgl_tpu.kernels.pairhmm_pallas import prepare_inputs_banded
    from mgl_tpu.ops.pairhmm import pack_pairs

    rng = np.random.default_rng(1)
    bases = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(B, rdlen))
    quals = rng.integers(20, 50, size=(B, rdlen)).astype(np.uint8)
    gcp = np.full((B, rdlen), 10, np.uint8)
    reads = [dict(bases=bases[b], q=quals[b], i=quals[b], d=quals[b],
                  c=gcp[b]) for b in range(B)]
    haps = [rng.choice(np.frombuffer(b"ACGT", np.uint8), size=haplen)
            for _ in range(min(B, 64))]
    batch = pack_pairs(reads, haps, [(b, b % len(haps)) for b in range(B)])
    a = prepare_inputs_banded(batch)
    keys = ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u", "pmx_u",
            "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0")
    return [jnp.asarray(a[k]) for k in keys], B * rdlen * haplen


def timeit(run, cells, iters=4):
    out = run()
    np.asarray(out[:1, :8])
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        outs = [run() for _ in range(iters)]
        np.asarray(outs[-1][:1, :8])
        best = min(best, (time.time() - t0) / iters)
    return cells / best / 1e9


def main():
    import jax
    from jax.experimental.pallas import tpu as pltpu

    import mgl_tpu.kernels.pairhmm_pallas as K

    args, cells = stage()

    g_prod = timeit(lambda: K.pairhmm_pallas_banded(*args), cells)
    print(f"prod     : {g_prod:6.2f} GCUPS", flush=True)

    real_roll = pltpu.roll
    # identity rolls: wrong numbers, same instruction stream otherwise.
    # Patch at trace time and jit the UNWRAPPED kernel builder so the
    # already-cached production jaxpr is not reused.
    pltpu.roll = lambda x, n, axis: x
    K.pltpu.roll = pltpu.roll
    try:
        inner = K.pairhmm_pallas_banded.__wrapped__
        fn = jax.jit(lambda *a: inner(*a))
        g_noroll = timeit(lambda: fn(*args), cells)
        print(f"no-roll  : {g_noroll:6.2f} GCUPS "
              f"(rolls cost {100 * (1 - g_prod / g_noroll):.0f}% of issue)",
              flush=True)
    finally:
        pltpu.roll = real_roll
        K.pltpu.roll = real_roll


if __name__ == "__main__":
    main()

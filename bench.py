"""Benchmark harness: one JSON line for the driver.

Headline metric: banded Smith-Waterman GCUPS per chip (batched 150 bp
pairs, full traceback emission — BASELINE.json config 2/3 shape), measured
on the default JAX backend.  vs_baseline = ours / (reference AVX2 kernel on
one CPU core of this host, tests/golden/cpu_baseline.json).

Timing method: enqueue N async kernel launches back-to-back, then force
completion with a single small device->host read.  This keeps the host
dispatch / tunnel round-trip out of the measured region (the axon tunnel
adds ~30 ms per synchronous call, which is not kernel cost).
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent


def _sync(x):
    np.asarray(x[:1, :8] if x.ndim >= 2 else x[:1])


def bench_sw(B=131072, T=150, Q=150, with_traceback=True, iters=6):
    import jax.numpy as jnp

    from mgl_tpu.kernels.sw_pallas import (prepare_inputs_banded,
                                           sw_pallas_banded)

    rng = np.random.default_rng(0)
    tbuf = rng.integers(65, 85, size=(B, T)).astype(np.int32)
    qbuf = tbuf.copy()
    mut = rng.random((B, Q)) < 0.05
    qbuf[mut] = rng.integers(65, 85, size=int(mut.sum()))
    tlen = np.full(B, T, np.int32)
    qlen = np.full(B, Q, np.int32)

    tchar, qp, tl, ql = prepare_inputs_banded(tbuf, tlen, qbuf, qlen)
    args = (jnp.asarray(tchar), jnp.asarray(qp), jnp.asarray(tl),
            jnp.asarray(ql), 25, -50, 110, 6)
    run = lambda: sw_pallas_banded(*args, indel_init=False,
                                   with_traceback=with_traceback)[0]
    _sync(run())  # compile + warm
    _sync(run())
    best = float("inf")
    for _ in range(5):       # best-of-5: the dev chip is a shared pool
        t0 = time.time()
        outs = [run() for _ in range(iters)]
        # sync the LAST output only: the single device stream executes
        # queued launches in order, so its completion implies all
        # completed.  Syncing every output re-added a ~25 ms tunnel
        # fetch per launch (measured: a completed tiny array still costs
        # a full round trip), which rounds 1-4 mistakenly counted as
        # kernel time — r4's 37.95 SW / 53.04 PairHMM GCUPS were this
        # dilution, not the kernels.
        _sync(outs[-1])
        best = min(best, (time.time() - t0) / iters)
    return B * T * Q / best / 1e9, best


def bench_pairhmm(B=32768, rdlen=150, haplen=400, iters=4):
    import jax.numpy as jnp

    from mgl_tpu.kernels.pairhmm_pallas import (pairhmm_pallas_banded,
                                                prepare_inputs_banded)
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
    args = tuple(jnp.asarray(a[k]) for k in
                 ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u",
                  "pmx_u", "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0"))

    run = lambda: pairhmm_pallas_banded(*args)
    _sync(run())
    _sync(run())
    best = float("inf")
    for _ in range(5):       # best-of-5: the dev chip is a shared pool
        t0 = time.time()
        outs = [run() for _ in range(iters)]
        _sync(outs[-1])      # single in-order sync (see bench_sw note)
        best = min(best, (time.time() - t0) / iters)
    return B * rdlen * haplen / best / 1e9, best


def _shared_hapset(rng, haplen: int, n_haps: int, mode: str):
    """Hap sets with controlled prefix sharing for the sharing sweep.

    mode: 'none' (independent haps, ~0% shared), 'low' (~30%), 'high'
    (~60%, the original headline shape), or 'gatk' (variant-site allele
    combinations on one consensus — the structure GATK's assembler
    produces — lexicographically sorted so consecutive haps share the
    prefix up to their first differing variant site)."""
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(ACGT, haplen)
    if mode == "none":
        return [rng.choice(ACGT, haplen) for _ in range(n_haps)]
    if mode == "gatk":
        sites = sorted(int(x) for x in rng.choice(
            np.arange(16, haplen - 16), size=6, replace=False))
        haps = []
        for _ in range(n_haps):
            h = base.copy()
            for s in sites:
                if rng.random() < 0.5:
                    h[s] = ACGT[(int(np.searchsorted(ACGT, h[s])) + 1) % 4]
            haps.append(h)
        return [h for h in sorted(haps, key=lambda a: a.tobytes())]
    lo, hi = ((haplen // 4, haplen * 2 // 5) if mode == "low"
              else (haplen * 3 // 8, haplen - 10))
    haps = [base.copy()]
    for p in sorted(int(x) for x in rng.integers(lo, hi, n_haps - 1)):
        h = haps[-1].copy()
        h[p] = ACGT[(int(np.searchsorted(ACGT, h[p])) + 1) % 4]
        haps.append(h)
    return haps


def _stage_shared_kernel(reads, haps):
    """Pre-stage the prefix-sharing shared-hap-set kernel's device args
    for (reads, haps); returns (run closure, sharing fraction)."""
    import jax.numpy as jnp

    import mgl_tpu.kernels.pairhmm_pallas as K
    from mgl_tpu.batch.bucketing import bucket_dims
    from mgl_tpu.core.context import CTX_F32
    from mgl_tpu.ops.pairhmm import compute_haplotype_similarities

    n_reads, n_haps = len(reads), len(haps)
    pos, _, cmax = compute_haplotype_similarities(haps)
    planes, rchar, rslen, pgapm1 = K.pack_reads_for_product(reads, 32)
    Bp = K._round_up(n_reads, K.LANES)

    def padl(a, dt):
        out = np.zeros((a.shape[0], Bp), dt)
        out[:, : a.shape[1]] = a
        return out

    seg_len = [len(h) - int(pos[j]) for j, h in enumerate(haps)]
    bases_ = np.concatenate([[0], np.cumsum(seg_len)]).astype(np.int64)
    S = int(bases_[-1])
    scp = K._round_up(bucket_dims(S + 34, (256, 512, 1024, 2048, 4096,
                                           8192)), 8)
    NSp = K._round_up(bucket_dims(n_haps, (8, 16, 32, 64, 128)), 8)
    hstream = np.zeros((scp, K.LANES), np.int32)
    segtab = np.zeros((5, NSp), np.int32)
    segtab[4, :] = -1
    segtab[0, n_haps:] = S
    for j, h in enumerate(haps):
        p = int(pos[j])
        hstream[bases_[j]: bases_[j + 1], :] = K.BASE_ENC[
            np.asarray(h)[p:, None]]
        segtab[0, j] = bases_[j]
        segtab[1, j] = p
        segtab[2, j] = len(h)
        segtab[3, j] = seg_len[j] + 31
        if j + 1 < n_haps and pos[j + 1] > 0:
            segtab[4, j] = int(pos[j + 1]) - p
    y_sh = np.float32(CTX_F32.initial_constant) / np.float32(cmax)
    u0 = padl((y_sh * pgapm1).astype(np.float32), np.float32)
    dev = [jnp.asarray(x) for x in
           (hstream, padl(rchar, np.int32), padl(rslen, np.int32), segtab,
            *(padl(p_, np.float32) for p_ in planes), u0)]
    run = lambda: K.pairhmm_pallas_shared(*dev, scp=scp, band=32)
    sharing = 1.0 - S / sum(len(h) for h in haps)
    return run, sharing


def bench_pairhmm_shared(n_reads=16384, n_haps=12, rdlen=152, haplen=400,
                         iters=3, hap_mode="high", repeats=5):
    """GATK-shaped product through the prefix-sharing shared-hap-set
    kernel (device-resident timing)."""
    rng = np.random.default_rng(5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    haps = _shared_hapset(rng, haplen, n_haps, hap_mode)
    base = haps[0]
    reads = []
    for _ in range(n_reads):
        st = int(rng.integers(0, haplen - rdlen))
        b = base[st: st + rdlen].copy()
        b[rng.integers(0, rdlen)] = ACGT[rng.integers(0, 4)]
        q = rng.integers(15, 45, rdlen).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(rdlen, 10, np.uint8)))

    # low-sharing hap sets blow the single-call VMEM budget (the carry
    # scales with the distinct-suffix stream): chunk exactly as the
    # engine does (bucketed read pad, chunk-local positions) and launch
    # all chunks per iteration
    from mgl_tpu.batch.bucketing import bucket_dims
    from mgl_tpu.ops.pairhmm import _shared_hap_chunks

    chunks = _shared_hap_chunks(haps, bucket_dims(rdlen))
    stages = [_stage_shared_kernel(reads, haps[lo:hi])
              for lo, hi in chunks]
    runs = [r for r, _ in stages]
    run = lambda: [r() for r in runs][-1]
    _sync(run())
    _sync(run())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        outs = [run() for _ in range(iters)]
        _sync(outs[-1])      # single in-order sync (see bench_sw note)
        best = min(best, (time.time() - t0) / iters)
    cells = n_reads * rdlen * sum(len(h) for h in haps)
    # effective sharing of the chunked launch (chunk starts reset the
    # shared prefix, matching the engine's production behavior)
    tot = sum(len(h) for h in haps)
    stream = 0.0
    for (_, sh), (lo, hi) in zip(stages, chunks):
        sub = sum(len(h) for h in haps[lo:hi])
        stream += (1.0 - sh) * sub
    sharing = 1.0 - stream / tot
    return cells / best / 1e9, sharing


def _engine_fixture(n_reads=512, n_haps=12, rdlen=151, haplen=420):
    """GATK-region-shaped batch with a 1/16 mismatched-read tail that
    rides the rescue tier (shared by the end-to-end and device-resident
    engine benches)."""
    rng = np.random.default_rng(7)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    base = rng.choice(ACGT, haplen)
    haps = [base.copy()]
    for p in sorted(int(x) for x in
                    rng.integers(haplen // 3, haplen - 10, n_haps - 1)):
        h = haps[-1].copy()
        h[p] = ACGT[(int(np.searchsorted(ACGT, h[p])) + 1) % 4]
        haps.append(h)
    reads = []
    for k in range(n_reads):
        st = int(rng.integers(0, haplen - rdlen))
        b = base[st: st + rdlen].copy()
        if k % 16 == 0:      # a mismatched tail that rides the rescue tier
            b = rng.choice(ACGT, rdlen)
            q = rng.integers(45, 60, rdlen).astype(np.uint8)
        else:
            b[rng.integers(0, rdlen)] = ACGT[rng.integers(0, 4)]
            q = rng.integers(15, 45, rdlen).astype(np.uint8)
        reads.append(dict(bases=b, q=q, i=q, d=q,
                          c=np.full(rdlen, 10, np.uint8)))
    return reads, haps


def bench_engine_device_resident(n_reads=512, n_haps=12, rdlen=151,
                                 haplen=420, iters=8, repeats=5):
    """Device-resident cascade throughput at the engine bench shape: the
    f32 shared-hap-set pass over the full product plus the xf rescue
    kernel over the 1/16 underflow tail, inputs PRE-STAGED on device and
    launches queued back-to-back with one sync at the end.  This is the
    chip-side cost of exactly the work bench_engine times end-to-end;
    the gap between the two numbers is host packing + per-call transport
    latency (the dev tunnel charges ~25-35 ms per synchronous call),
    not kernel time."""
    import jax.numpy as jnp

    import mgl_tpu.kernels.pairhmm_xf_pallas as XF
    from mgl_tpu.kernels.pairhmm_pallas import (BASE_ENC, _stack_tracks,
                                                env_interpret)
    from mgl_tpu.core.context import CTX_F64
    from mgl_tpu.ops.pairhmm import BASE_NORM
    from mgl_tpu.ops.xfloat import xf_split

    reads, haps = _engine_fixture(n_reads, n_haps, rdlen, haplen)
    reads = [{**r, "bases": BASE_NORM[r["bases"]]} for r in reads]
    haps = [BASE_NORM[h] for h in haps]
    run_f32, _ = _stage_shared_kernel(reads, haps)

    # rescue tail: every hap of each mismatched read (the engine's actual
    # underflow set at this fixture), staged as rescue_scores_xf_banded
    # does (kernels/pairhmm_xf_pallas.py:694-752) but with device args
    # built once outside the timed region
    tail_reads = [reads[k] for k in range(0, n_reads, 16)]
    pairs = [(r, h) for r in range(len(tail_reads)) for h in range(n_haps)]
    B = len(pairs)
    band = 32
    Bp = XF._round_up(B, XF.LANES)
    q, i, d, c, rbases, rlens = _stack_tracks(tail_reads)
    Rb = XF._round_up(int(rlens.max()), band)
    hmax = max(len(h) for h in haps)
    hap_a = np.zeros((hmax + band, n_haps), np.int32)
    haplen_a = np.zeros((1, n_haps), np.int32)
    y_init = np.zeros((1, n_haps), np.float64)
    for k, hp in enumerate(haps):
        hap_a[: len(hp), k] = BASE_ENC[np.asarray(hp)]
        haplen_a[0, k] = len(hp)
        y_init[0, k] = float(CTX_F64.initial_constant) / float(len(hp))
    pi = np.asarray(pairs, np.int64)
    ridx = np.zeros(Bp, np.int64)
    hidx = np.zeros(Bp, np.int64)
    ridx[:B] = pi[:, 0]
    hidx[:B] = pi[:, 1]
    yih, yil, yie = xf_split(y_init)
    tabs = XF._xf_tables()
    xf_args = tuple(jnp.asarray(a) for a in
                    (q, i, d, c, rbases, rlens, hap_a, haplen_a,
                     yih, yil, yie, ridx, hidx))
    run_xf = lambda: XF._xf_product_forward_tracks(
        *xf_args, tabs, Rb=Rb, band=band, interpret=env_interpret(),
        stream=False, stream_carry=False)

    _sync(run_f32())
    _sync(run_xf())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        outs = [(run_f32(), run_xf()) for _ in range(iters)]
        # one sync: the single device stream executes dispatches in
        # order, so the last result's completion implies all completed —
        # per-output syncs would re-add a ~25 ms tunnel round trip each,
        # which is exactly the transport cost this bench excludes
        _sync(outs[-1][0])
        _sync(outs[-1][1])
        best = min(best, (time.time() - t0) / iters)
    return n_reads * n_haps / best


def bench_engine(n_reads=512, n_haps=12, rdlen=151, haplen=420):
    """End-to-end engine throughput: the full cascade (seed/dedup, f32
    device pass, extended-range rescue tail) including host packing and
    transfers — the number that covers what the kernel GCUPS excludes."""
    from mgl_tpu.api import PairHmmEngine

    reads, haps = _engine_fixture(n_reads, n_haps, rdlen, haplen)
    from mgl_tpu.utils.metrics import METRICS

    eng = PairHmmEngine()
    eng.compute_likelihoods(reads[:64], haps)     # warm compiles
    best = float("inf")
    stages = {}
    for _ in range(5):    # best-of-5: shared-pool congestion can double
                          # a single trial's round-trip-bound stages
        METRICS.reset()
        t0 = time.time()
        out = eng.compute_likelihoods(reads, haps)
        dt = time.time() - t0
        if dt < best:
            best = dt
            snap = METRICS.snapshot()["timers_s"]
            stages = {k.split(".", 1)[1]: v for k, v in snap.items()
                      if k.startswith("engine.")}
            stages["other"] = round(best - sum(stages.values()), 4)
    assert out.shape == (n_reads, n_haps)
    pairs_per_s = n_reads * n_haps / best

    # pipelined engine over a stream of batches (GATK's call pattern:
    # one computeLikelihoods per assembly region): overlapped in-flight
    # batches hide the round-trip latency a single call pays in full
    n_stream = 8
    batches = [(reads, haps)] * n_stream
    list(eng.compute_likelihoods_stream(batches[:2]))   # warm
    best_s = float("inf")
    for _ in range(5):
        t0 = time.time()
        outs = list(eng.compute_likelihoods_stream(batches))
        best_s = min(best_s, time.time() - t0)
    assert len(outs) == n_stream and np.array_equal(outs[0], out)
    stream_pairs_per_s = n_stream * n_reads * n_haps / best_s

    # the reference's explicitly supported all-double configuration
    # (initNative(use_double=true)): every pair rides the extended-range
    # xfloat tier instead of the f32 cascade
    eng_d = PairHmmEngine(use_double=True)
    eng_d.compute_likelihoods(reads[:64], haps)   # warm compiles
    best_d = float("inf")
    for _ in range(3):
        t0 = time.time()
        out_d = eng_d.compute_likelihoods(reads, haps)
        best_d = min(best_d, time.time() - t0)
    assert out_d.shape == (n_reads, n_haps)
    return (pairs_per_s, stream_pairs_per_s,
            n_reads * n_haps / best_d, stages)


def main():
    import jax

    baseline = json.loads(
        (ROOT / "tests/golden/cpu_baseline.json").read_text())

    sw_gcups, sw_t = bench_sw(with_traceback=True)
    sw_score_gcups, _ = bench_sw(with_traceback=False)
    ph_gcups, ph_t = bench_pairhmm()
    ph_shared_gcups, sharing = bench_pairhmm_shared()
    # sharing sweep: bounds the prefix-sharing claim (the headline 'high'
    # shape shares ~61%; GATK hap sets share less)
    shared_sweep = {}
    for mode in ("none", "low", "gatk"):
        g, s = bench_pairhmm_shared(hap_mode=mode, repeats=3)
        shared_sweep[mode] = {"gcups": round(g, 2), "sharing": round(s, 3)}
    shared_sweep["high"] = {"gcups": round(ph_shared_gcups, 2),
                            "sharing": round(sharing, 3)}
    (engine_pairs, engine_pairs_stream,
     engine_pairs_double, engine_stages) = bench_engine()
    engine_pairs_device = bench_engine_device_resident(repeats=3)

    vs = sw_gcups / baseline["sw_avx_gcups_150"]
    out = {
        "metric": "sw_gcups_per_chip",
        "value": round(sw_gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(vs, 1),
        "extra": {
            "backend": jax.default_backend(),
            "sw_traceback_gcups": round(sw_gcups, 2),
            "sw_score_only_gcups": round(sw_score_gcups, 2),
            "pairhmm_f32_gcups": round(ph_gcups, 2),
            "pairhmm_shared_gcups": round(ph_shared_gcups, 2),
            "pairhmm_shared_prefix_saving": round(sharing, 3),
            "pairhmm_shared_gcups_by_sharing": shared_sweep,
            "engine_pairs_per_s": round(engine_pairs, 0),
            "engine_pairs_per_s_stream": round(engine_pairs_stream, 0),
            "engine_pairs_per_s_double": round(engine_pairs_double, 0),
            "engine_pairs_per_s_device_resident": round(engine_pairs_device,
                                                        0),
            "engine_stage_s": engine_stages,
            "pairhmm_vs_baseline": round(
                ph_gcups / baseline["pairhmm_avxf_gcups_150x400"], 1),
            "pairhmm_shared_vs_baseline": round(
                ph_shared_gcups / baseline["pairhmm_avxf_gcups_150x400"], 1),
            "baseline_cpu_sw_gcups": baseline["sw_avx_gcups_150"],
            "baseline_cpu_pairhmm_gcups":
                baseline["pairhmm_avxf_gcups_150x400"],
        },
    }
    scale = ROOT / "tests/golden/scale_report.json"
    if scale.exists():
        rep = json.loads(scale.read_text())
        c4 = rep.get("config4_seed_extend_1m", {})
        c5 = rep.get("config5_align_sort", {})
        c4g = rep.get("config4_3gbp", {})
        c4c = rep.get("config4_cigar_1m", {})
        out["extra"]["scale_runs"] = {
            "source": "tools/run_scale_configs.py (recorded, not re-run here)",
            "mapper_reads_per_s_1m": c4.get("reads_per_s"),
            "mapper_window_accuracy": c4.get("window_accuracy"),
            "mapper_reads_per_s_3gbp": c4g.get("reads_per_s"),
            "mapper_3gbp_accuracy": c4g.get("window_accuracy"),
            "mapper_cigar_1m_reads_per_s": c4c.get("reads_per_s"),
            "sort_10m_mkeys_per_s": c5.get("sort_10m_mkeys_per_s"),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Banded extended-range (xfloat) PairHMM Pallas kernel — the rescue tier
on the TPU's fast path.

The reference's rescue is its AVX2 double kernel
(compute_prob_avxd.cc:6-982).  The TPU-native number format is xfloat
(ops/xfloat.py: double-float mantissa + per-element i32 exponent, range
and precision beyond f64 for this nonnegative DP).  Round 1 ran the
rescue as an XLA anti-diagonal scan (ops/xfloat.pairhmm_forward_xf, the
executable spec); this kernel is the banded staggered-wavefront
re-expression — the same banding, pre-multiplied U/W carry streams, and
windowed last-row sampling as the f32 production kernel
(kernels/pairhmm_pallas._pairhmm_banded_kernel), with every value an
(hi, lo, e) triple:

* DP state lives in vector registers as three planes per stream;
* the inter-band carry array holds 6 f32 planes per buffer (U.hi, U.lo,
  U.e-bitcast, W.hi, W.lo, W.e-bitcast) — exponents ride bitcast to f32
  so one VMEM scratch dtype serves all planes;
* last-row sampling exploits that at most ONE sublane per lane is the
  read's last row in a band: masked sum (hi, lo) / masked max (e)
  collapse the active sublane exactly, then one xf_add accumulates;
* transition/emission rows arrive as stacked (8, Rb, B) hi/lo/e planes
  split on host from the CTX_F64 tables (Context.h:105-134).

Scores factor through the U/W pre-multiplication, so they differ from
the scan spec only in rounding (~1e-12 log10, far inside the 1e-5
contract); rescue *decisions* are made upstream on the f32 pass and are
unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgl_tpu.kernels.pairhmm_pallas import LANES, _imode, _round_up
from mgl_tpu.ops.xfloat import E_ZERO, XF, xf_add, xf_mul, xf_split, xf_where

# transition/emission plane order (matches the f32 banded kernel's refs)
_PLANES = ("pmm_u", "pgapm_u", "pmx_u", "pzz_u", "p_my", "p_zz", "dm", "dmm")


def _b2f(e):
    return jax.lax.bitcast_convert_type(e, jnp.float32)


def _f2b(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _xf_roll(a: XF) -> XF:
    return XF(pltpu.roll(a.hi, 1, 0), pltpu.roll(a.lo, 1, 0),
              pltpu.roll(a.e, 1, 0))


def _pairhmm_banded_xf_kernel(
    hap_ref, rchar_ref, rslen_ref, haplen_ref, tlo_ref, thi_ref,
    hi_ref, lo_ref, ee_ref,          # (8, Rb, LANES) transition planes
    u0h_ref, u0l_ref, u0e_ref,       # (1, LANES) yInit * pGapM[1]
    sh_ref, sl_ref, se_ref,          # outs: score triple (1, LANES)
    carry_ref,                       # scratch (2, 6, Hcp, LANES) f32
    *, BH: int, NB: int, NT: int, Hcp: int, HR: int,
):
    row = jax.lax.broadcasted_iota(jnp.int32, (BH, LANES), 0)
    row0 = row == 0
    rsl_row = rslen_ref[0:1, :]
    hl_row = haplen_ref[0:1, :]
    u0 = XF(u0h_ref[0:1, :], u0l_ref[0:1, :], u0e_ref[0:1, :])
    TRASH = Hcp - 1

    # prefill read buffer 0: U = u0 at every column (row-0 boundary),
    # W = xf zero; write buffer 1: xf zeros
    zcol = jnp.zeros((1, 1, Hcp, LANES), jnp.float32)
    ezcol = jnp.full((1, 1, Hcp, LANES), np.int32(E_ZERO), jnp.int32)
    carry_ref[0:1, 0:1] = jnp.broadcast_to(u0.hi, (Hcp, LANES))[None, None]
    carry_ref[0:1, 1:2] = jnp.broadcast_to(u0.lo, (Hcp, LANES))[None, None]
    carry_ref[0:1, 2:3] = _b2f(
        jnp.broadcast_to(u0.e, (Hcp, LANES)))[None, None]
    carry_ref[0:1, 3:4] = zcol
    carry_ref[0:1, 4:5] = zcol
    carry_ref[0:1, 5:6] = _b2f(ezcol)
    carry_ref[1:2, 0:1] = zcol
    carry_ref[1:2, 1:2] = zcol
    carry_ref[1:2, 2:3] = _b2f(ezcol)
    carry_ref[1:2, 3:4] = zcol
    carry_ref[1:2, 4:5] = zcol
    carry_ref[1:2, 5:6] = _b2f(ezcol)

    def band(b, acc):
        r = pl.ds(b * BH, BH)
        rch = rchar_ref[r]
        pln = [XF(hi_ref[pl.ds(p, 1), r][0], lo_ref[pl.ds(p, 1), r][0],
                  ee_ref[pl.ds(p, 1), r][0]) for p in range(8)]
        pmm_u, pgapm_u, pmx_u, pzz_u, pmy, pzz, dmb, dmmb = pln
        mask_last = (row + b * BH + 1) == rsl_row
        rd = b % 2
        wr = (b + 1) % 2

        def cread(stream, idx):
            # stream 0 = U (planes 0-2), 1 = W (planes 3-5)
            p0 = 3 * stream
            return XF(
                carry_ref[pl.ds(rd, 1), pl.ds(p0, 1), pl.ds(idx, 1)][0, 0],
                carry_ref[pl.ds(rd, 1), pl.ds(p0 + 1, 1),
                          pl.ds(idx, 1)][0, 0],
                _f2b(carry_ref[pl.ds(rd, 1), pl.ds(p0 + 2, 1),
                               pl.ds(idx, 1)][0, 0]),
            )

        # data-anchored zeros (Mosaic relayout gotcha): hi/lo ride the
        # loaded emission plane, e rides the loaded read chars
        zf = dmb.hi * 0.0
        zi = jnp.minimum(rch, 0) + np.int32(E_ZERO)
        zero = XF(zf, zf, zi)

        def bsel(cond, a: XF, b_: XF) -> XF:
            return XF(jnp.where(cond, a.hi, b_.hi),
                      jnp.where(cond, a.lo, b_.lo),
                      jnp.where(cond, a.e, b_.e))

        u0b = XF(zf + u0.hi, zf + u0.lo, zi * 0 + u0.e)
        u_pp = bsel(row0 & (b == 0), u0b, zero)
        u_p = bsel(row0, cread(0, 1), zero)
        w_p = bsel(row0, cread(1, 1), zero)
        m_un, y_un = zero, zero
        hd = jnp.where(row0, hap_ref[0:1, :], 0)

        def step(t, carry, *, sample: bool = True):
            m_un, y_un, w_p, u_p, u_pp, hd, acc = carry

            distm = xf_where((rch & hd) != 0, dmb, dmmb)
            m_cur = xf_mul(distm, u_pp)
            x_cur = w_p
            y_cur = xf_add(xf_mul(m_un, pmy), xf_mul(y_un, pzz))

            if sample:
                # at most one sublane per lane is the read's last row:
                # masked sum (hi/lo) + masked max (e) extract it exactly
                mx = xf_add(m_cur, x_cur)
                c = t + b * BH + 2 - rsl_row
                valid = (c >= 1) & (c <= hl_row)
                sel = mask_last & valid
                contrib = XF(
                    jnp.sum(jnp.where(sel, mx.hi, 0.0), axis=0,
                            keepdims=True),
                    jnp.sum(jnp.where(sel, mx.lo, 0.0), axis=0,
                            keepdims=True),
                    jnp.max(jnp.where(sel, mx.e, np.int32(E_ZERO)),
                            axis=0, keepdims=True),
                )
                acc = xf_add(acc, contrib)

            u = xf_add(xf_mul(m_cur, pmm_u),
                       xf_mul(xf_add(x_cur, y_cur), pgapm_u))
            w = xf_add(xf_mul(m_cur, pmx_u), xf_mul(x_cur, pzz_u))
            u_sh = _xf_roll(u)
            w_sh = _xf_roll(w)

            st = t - BH + 2
            st = jnp.where(st >= 1, st, TRASH)
            carry_ref[pl.ds(wr, 1), 0:1, pl.ds(st, 1)] = \
                u_sh.hi[0:1][None, None]
            carry_ref[pl.ds(wr, 1), 1:2, pl.ds(st, 1)] = \
                u_sh.lo[0:1][None, None]
            carry_ref[pl.ds(wr, 1), 2:3, pl.ds(st, 1)] = \
                _b2f(u_sh.e[0:1])[None, None]
            carry_ref[pl.ds(wr, 1), 3:4, pl.ds(st, 1)] = \
                w_sh.hi[0:1][None, None]
            carry_ref[pl.ds(wr, 1), 4:5, pl.ds(st, 1)] = \
                w_sh.lo[0:1][None, None]
            carry_ref[pl.ds(wr, 1), 5:6, pl.ds(st, 1)] = \
                _b2f(w_sh.e[0:1])[None, None]

            ld = jnp.minimum(t + 2, Hcp - 1)
            u_sh = bsel(row0, cread(0, ld), u_sh)
            w_sh = bsel(row0, cread(1, ld), w_sh)

            hrow = hap_ref[pl.ds(jnp.minimum(t + 1, HR - 1), 1), :]
            hd = jnp.where(row0, hrow, pltpu.roll(hd, 1, 0))

            return (m_cur, y_cur, w_sh, u_sh, u_p, hd, acc)

        tile = pl.program_id(0)
        t_lo = jnp.clip(tlo_ref[b, tile], 0, NT)
        t_hi = jnp.clip(thi_ref[b, tile], t_lo, NT)
        carry = (m_un, y_un, w_p, u_p, u_pp, hd, acc)
        nos = functools.partial(step, sample=False)
        carry = jax.lax.fori_loop(0, t_lo, nos, carry)
        carry = jax.lax.fori_loop(t_lo, t_hi, step, carry)
        carry = jax.lax.fori_loop(t_hi, NT, nos, carry)
        return carry[-1]

    zacc = XF(u0.hi * 0.0, u0.hi * 0.0,
              jnp.minimum(u0.e, 0) * 0 + np.int32(E_ZERO))
    acc = jax.lax.fori_loop(0, NB, band, zacc)
    sh_ref[:] = acc.hi
    sl_ref[:] = acc.lo
    se_ref[:] = acc.e


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def pairhmm_pallas_banded_xf(
    hap,        # (HR, Bp) int32 RAW hap chars (row t = hap base t)
    rchar,      # (Rb, Bp) int32 raw read chars (row k = read base k+1)
    rslen, haplen,               # (1, Bp) int32
    hi_planes, lo_planes,        # (8, Rb, Bp) f32
    e_planes,                    # (8, Rb, Bp) int32
    u0h, u0l, u0e,               # (1, Bp)
    *, band: int = 32, interpret: bool = False,
):
    """Banded-wavefront extended-range forward.  Returns the (1, Bp)
    score triple (hi, lo, e).  Chars are RAW bytes matched like the spec
    (equality or N-wildcard folded into one-hot upstream)."""
    Rb, Bp = rchar.shape
    HR = hap.shape[0]
    BH = band
    NB = Rb // BH
    H = HR - BH
    NT = H + BH - 1
    Hcp = _round_up(H + BH + 4, 8)
    n_tiles = Bp // LANES

    # per-(band, tile) last-row sampling windows (same derivation as the
    # f32 wrapper)
    rsl = rslen[0].astype(jnp.int32)
    hl = haplen[0].astype(jnp.int32)
    lane_band = (rsl - 1) // BH
    t1 = rsl - 1 - lane_band * BH
    bands = jnp.arange(NB, dtype=jnp.int32)[:, None]
    in_band = (lane_band[None, :] == bands) & (rsl[None, :] >= 1)
    tlo = jnp.min(jnp.where(in_band, t1[None, :], NT)
                  .reshape(NB, n_tiles, LANES), axis=2)
    thi = jnp.max(jnp.where(in_band, t1[None, :] + hl[None, :], 0)
                  .reshape(NB, n_tiles, LANES), axis=2)

    def col(i):
        return (0, i)

    vm = lambda shape: pl.BlockSpec(shape, col, memory_space=pltpu.VMEM)
    vm3 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0, i),
                                     memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((NB, n_tiles), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)
    kernel = functools.partial(_pairhmm_banded_xf_kernel, BH=BH, NB=NB,
                               NT=NT, Hcp=Hcp, HR=HR)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            vm((HR, LANES)), vm((Rb, LANES)), vm((1, LANES)), vm((1, LANES)),
            sm, sm,
            vm3((8, Rb, LANES)), vm3((8, Rb, LANES)), vm3((8, Rb, LANES)),
            vm((1, LANES)), vm((1, LANES)), vm((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 6, Hcp, LANES), jnp.float32),
        ],
        interpret=_imode(interpret),
    )(hap, rchar, rslen, haplen, tlo.astype(jnp.int32),
      thi.astype(jnp.int32), hi_planes, lo_planes, e_planes, u0h, u0l, u0e)
    return XF(*outs)


def _xf_fits_vmem(rdlen: int, haplen: int, budget_mb: float = 12.0) -> bool:
    """xfloat banded working set: 24 transition planes + 12 carry
    columns + hap/char rows."""
    rb = (rdlen + 31) // 32 * 32
    hr = haplen + 40
    est = (25 * rb + hr + 12 * hr + 256) * 128 * 4
    return est <= budget_mb * 1e6


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def _xf_product_forward(hap, haplen, yih, yil, yie,
                        rchar, rslen, hi_p, lo_p, e_p, g1h, g1l, g1e,
                        ridx, hidx, *, band: int, interpret: bool):
    """Device-side product expansion for the xfloat kernel: per-read
    planes and per-hap columns ship once; lanes gather on device (the
    transfer, not the DP, dominates rescue batches through a host link).
    u0 = yInit * pGapM[1] is an on-device xf_mul."""
    hp = hap[:, hidx]
    hl = haplen[:, hidx]
    rc = rchar[:, ridx]
    rl = rslen[:, ridx]
    planes = XF(hi_p[:, :, ridx], lo_p[:, :, ridx], e_p[:, :, ridx])
    u0 = xf_mul(XF(yih[:, hidx], yil[:, hidx], yie[:, hidx]),
                XF(g1h[:, ridx], g1l[:, ridx], g1e[:, ridx]))
    return pairhmm_pallas_banded_xf(
        hp, rc, rl, hl, planes.hi, planes.lo, planes.e,
        u0.hi, u0.lo, u0.e, band=band, interpret=interpret)


def rescue_scores_xf_banded(reads: list[dict], haps: list[np.ndarray],
                            pairs: list[tuple[int, int]],
                            pad_to: tuple[int, int] | None = None
                            ) -> np.ndarray:
    """Banded-kernel rescue scores: (B,) f64, 2^1020-scaled (the drop-in
    fast path for ops/xfloat.rescue_scores_xf)."""
    from mgl_tpu.core.context import CTX_F64, read_transition_rows
    from mgl_tpu.kernels.pairhmm_pallas import BASE_ENC, env_interpret
    from mgl_tpu.ops.xfloat import xf_to_f64

    B = len(pairs)
    band = 32
    ur = sorted({ri for ri, _ in pairs})
    uh = sorted({hi for _, hi in pairs})
    rmap = {r: k for k, r in enumerate(ur)}
    hmap = {h: k for k, h in enumerate(uh)}
    rmax = max(len(reads[ri]["bases"]) for ri in ur)
    hmax = max(len(haps[hi]) for hi in uh)
    if pad_to is not None:
        rmax, hmax = max(rmax, pad_to[0]), max(hmax, pad_to[1])
    Bp = _round_up(max(B, 1), LANES)
    Rb = _round_up(rmax, band)
    HR = hmax + band
    R = rmax + 1
    n_r, n_h = len(ur), len(uh)

    # per-read planes (8, Rb, n_r) f64 in kernel order, with the banded
    # shifts (prepare_inputs_banded: *_u rows drop 2, consumers drop 1)
    src = {  # plane -> (track index, drop)
        0: (0, 2), 1: (1, 2), 2: (2, 2), 3: (4, 2),
        4: (3, 1), 5: (4, 1), 6: (5, 1), 7: (6, 1),
    }
    planes = np.zeros((8, Rb, n_r), np.float64)
    rchar = np.zeros((Rb, n_r), np.int32)
    rslen = np.zeros((1, n_r), np.int32)
    pgapm1 = np.zeros((1, n_r), np.float64)
    for k, ri in enumerate(ur):
        rd = reads[ri]
        t = read_transition_rows(rd["q"], rd["i"], rd["d"], rd["c"], CTX_F64)
        distm = t[5]
        tr = t[:5] + (1.0 - distm, distm * (1.0 / 3.0))
        n = len(rd["bases"])
        rchar[:n, k] = BASE_ENC[np.asarray(rd["bases"])]
        rslen[0, k] = n
        pgapm1[0, k] = tr[1][1]
        for p, (ti, drop) in src.items():
            seg = tr[ti][drop:]
            planes[p, : len(seg), k] = seg

    hap_a = np.zeros((HR, n_h), np.int32)
    haplen = np.zeros((1, n_h), np.int32)
    y_init = np.zeros((1, n_h), np.float64)
    for k, hi in enumerate(uh):
        hp = haps[hi]
        hap_a[: len(hp), k] = BASE_ENC[np.asarray(hp)]
        haplen[0, k] = len(hp)
        y_init[0, k] = float(CTX_F64.initial_constant) / float(len(hp))
    haplen = np.maximum(haplen, 1)

    ridx = np.zeros(Bp, np.int64)
    hidx = np.zeros(Bp, np.int64)
    for b, (ri, hi) in enumerate(pairs):
        ridx[b], hidx[b] = rmap[ri], hmap[hi]

    hi_p, lo_p, e_p = xf_split(planes)
    g1h, g1l, g1e = xf_split(pgapm1)
    yih, yil, yie = xf_split(y_init)
    score = _xf_product_forward(
        jnp.asarray(hap_a), jnp.asarray(haplen),
        jnp.asarray(yih), jnp.asarray(yil), jnp.asarray(yie),
        jnp.asarray(rchar), jnp.asarray(rslen),
        jnp.asarray(hi_p), jnp.asarray(lo_p), jnp.asarray(e_p),
        jnp.asarray(g1h), jnp.asarray(g1l), jnp.asarray(g1e),
        jnp.asarray(ridx), jnp.asarray(hidx),
        band=band, interpret=env_interpret())
    return xf_to_f64(np.asarray(score.hi)[0, :B],
                     np.asarray(score.lo)[0, :B],
                     np.asarray(score.e)[0, :B])

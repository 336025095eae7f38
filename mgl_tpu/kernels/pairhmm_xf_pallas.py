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
    *refs,
    BH: int, NB: int, NT: int, Hcp: int, HR: int, stream: bool = False,
    stream_carry: bool = False, CW: int = 256,
):
    """Banded xfloat wavefront; ref layout mirrors the f32 kernel
    (kernels/pairhmm_pallas._pairhmm_banded_kernel):

    * base mode: carry scratch (2, 6, Hcp, LANES) — 6 f32 planes =
      (U, W) x (hi, lo, e-bitcast);
    * ``stream`` (long reads): the (8, Rb, Bp) hi/lo/e transition-plane
      stacks and read chars live in HBM; (8, BH, LANES) band slices DMA
      through double-buffered VMEM scratch;
    * ``stream_carry`` (long haps): the 6-plane inter-band carry and the
      hap char plane live in HBM (carry as a pl.ANY ride-along output
      right after the score triple); CW-column windows DMA through VMEM
      with the same chunk gating as the f32 kernel.
    """
    refs = list(refs)
    if stream_carry:
        cr_win, cw_win, hp_win, cr_sem, cw_sem, hp_sem = refs[-6:]
        refs = refs[:-6]
    if stream:
        (hap_ref, rchar_ref, rslen_ref, haplen_ref, tlo_ref, thi_ref,
         hi_ref, lo_ref, ee_ref, u0h_ref, u0l_ref, u0e_ref,
         sh_ref, sl_ref, se_ref, carry_ref,
         fh_buf, fl_buf, fe_buf, rc_buf,
         fh_sem, fl_sem, fe_sem, rc_sem) = refs

        def _band_dma(b, slot):
            tile0 = pl.program_id(0) * LANES
            lanes = pl.ds(tile0, LANES)
            rows = pl.ds(b * BH, BH)
            return (
                pltpu.make_async_copy(hi_ref.at[:, rows, lanes],
                                      fh_buf.at[slot], fh_sem.at[slot]),
                pltpu.make_async_copy(lo_ref.at[:, rows, lanes],
                                      fl_buf.at[slot], fl_sem.at[slot]),
                pltpu.make_async_copy(ee_ref.at[:, rows, lanes],
                                      fe_buf.at[slot], fe_sem.at[slot]),
                pltpu.make_async_copy(rchar_ref.at[rows, lanes],
                                      rc_buf.at[slot], rc_sem.at[slot]),
            )

        for d in _band_dma(0, 0):
            d.start()
    else:
        (hap_ref, rchar_ref, rslen_ref, haplen_ref, tlo_ref, thi_ref,
         hi_ref, lo_ref, ee_ref, u0h_ref, u0l_ref, u0e_ref,
         sh_ref, sl_ref, se_ref, carry_ref) = refs
    row = jax.lax.broadcasted_iota(jnp.int32, (BH, LANES), 0)
    row0 = row == 0
    rsl_row = rslen_ref[0:1, :]
    hl_row = haplen_ref[0:1, :]
    u0 = XF(u0h_ref[0:1, :], u0l_ref[0:1, :], u0e_ref[0:1, :])
    TRASH = Hcp - 1
    tile = pl.program_id(0)

    if stream_carry:
        Hcph = carry_ref.shape[2]
        n_ck = Hcph // CW
        kr_max = (NT + 1) // CW          # last carry chunk any read touches
        kh_max = NT // CW                # last hap chunk any read touches
        kw_last = max(NT - BH + 1, 1) // CW   # last carry chunk written

        def _cr_dma(k, rd):
            return pltpu.make_async_copy(
                carry_ref.at[pl.ds(rd, 1), :, pl.ds(k * CW, CW), :],
                cr_win.at[pl.ds(k % 2, 1)],
                cr_sem.at[k % 2],
            )

        def _cw_dma(k, wr, slot):
            return pltpu.make_async_copy(
                cw_win.at[pl.ds(slot, 1), :, pl.ds(0, CW)],
                carry_ref.at[pl.ds(wr, 1), :, pl.ds(k * CW, CW), :],
                cw_sem.at[slot],
            )

        def _hp_dma(k):
            return pltpu.make_async_copy(
                hap_ref.at[pl.ds(k * CW, CW), pl.ds(tile * LANES, LANES)],
                hp_win.at[k % 2],
                hp_sem.at[k % 2],
            )

        # prefill both HBM carry buffers chunk by chunk: buffer 0 is the
        # row-0 boundary (U = u0, W = xf zero); buffer 1 xf zeros
        zb = jnp.broadcast_to(u0.hi * 0.0, (CW, LANES))
        ezb = _b2f(jnp.broadcast_to(jnp.minimum(u0.e, 0) * 0
                                    + np.int32(E_ZERO), (CW, LANES)))

        def _init_ck(k, _):
            cw_win[0:1, 0:1, pl.ds(0, CW)] = \
                jnp.broadcast_to(u0.hi, (CW, LANES))[None, None]
            cw_win[0:1, 1:2, pl.ds(0, CW)] = \
                jnp.broadcast_to(u0.lo, (CW, LANES))[None, None]
            cw_win[0:1, 2:3, pl.ds(0, CW)] = _b2f(
                jnp.broadcast_to(u0.e, (CW, LANES)))[None, None]
            cw_win[0:1, 3:4, pl.ds(0, CW)] = zb[None, None]
            cw_win[0:1, 4:5, pl.ds(0, CW)] = zb[None, None]
            cw_win[0:1, 5:6, pl.ds(0, CW)] = ezb[None, None]
            cp = _cw_dma(k, 0, 0)
            cp.start()
            cp.wait()
            cw_win[0:1, 0:1, pl.ds(0, CW)] = zb[None, None]
            cw_win[0:1, 1:2, pl.ds(0, CW)] = zb[None, None]
            cw_win[0:1, 2:3, pl.ds(0, CW)] = ezb[None, None]
            cp = _cw_dma(k, 1, 0)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, n_ck, _init_ck, 0)
    else:
        # prefill read buffer 0: U = u0 at every column (row-0 boundary),
        # W = xf zero; write buffer 1: xf zeros
        zcol = jnp.zeros((1, 1, Hcp, LANES), jnp.float32)
        ezcol = jnp.full((1, 1, Hcp, LANES), np.int32(E_ZERO), jnp.int32)
        carry_ref[0:1, 0:1] = jnp.broadcast_to(u0.hi,
                                               (Hcp, LANES))[None, None]
        carry_ref[0:1, 1:2] = jnp.broadcast_to(u0.lo,
                                               (Hcp, LANES))[None, None]
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
        if stream:
            rd2 = b % 2
            for d in _band_dma(b, rd2):
                d.wait()

            @pl.when(b + 1 < NB)
            def _prefetch():
                for d in _band_dma(b + 1, (b + 1) % 2):
                    d.start()

            fh = fh_buf[pl.ds(rd2, 1)][0]
            fl = fl_buf[pl.ds(rd2, 1)][0]
            fe = fe_buf[pl.ds(rd2, 1)][0]
            rch = rc_buf[pl.ds(rd2, 1)][0]
            pln = [XF(fh[p], fl[p], fe[p]) for p in range(8)]
        else:
            r = pl.ds(b * BH, BH)
            rch = rchar_ref[r]
            pln = [XF(hi_ref[pl.ds(p, 1), r][0], lo_ref[pl.ds(p, 1), r][0],
                      ee_ref[pl.ds(p, 1), r][0]) for p in range(8)]
        pmm_u, pgapm_u, pmx_u, pzz_u, pmy, pzz, dmb, dmmb = pln
        mask_last = (row + b * BH + 1) == rsl_row
        rd = b % 2
        wr = (b + 1) % 2
        if stream_carry:
            # per-band window resets: carry reads restart at column 1 and
            # hap reads at row 0 every band
            _cr_dma(0, rd).start()
            if kr_max >= 1:
                _cr_dma(1, rd).start()
            _hp_dma(0).start()
            if kh_max >= 1:
                _hp_dma(1).start()
            _cr_dma(0, rd).wait()
            _hp_dma(0).wait()

        def cread(stream_i, idx):
            # stream 0 = U (planes 0-2), 1 = W (planes 3-5)
            p0 = 3 * stream_i
            if stream_carry:
                w = pl.ds((idx // CW) % 2, 1)
                c = pl.ds(idx % CW, 1)
                return XF(
                    cr_win[w, pl.ds(p0, 1), c][0, 0],
                    cr_win[w, pl.ds(p0 + 1, 1), c][0, 0],
                    _f2b(cr_win[w, pl.ds(p0 + 2, 1), c][0, 0]),
                )
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
        if stream_carry:
            hd = jnp.where(row0, hp_win[pl.ds(0, 1), 0:1, :][0], 0)
        else:
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

            st0 = t - BH + 2
            if stream_carry:
                # windowed carry write (f32 kernel's chunk gating): row
                # st0 lands in chunk kw of the write window; full (or
                # final-partial) chunks flush to HBM by async DMA;
                # pre-wavefront steps write the window's trash row (CW)
                valid_w = st0 >= 1
                kw = jnp.maximum(st0, 0) // CW
                slot_w = kw % 2
                stw = jnp.where(valid_w, st0 - kw * CW, CW)

                @pl.when(valid_w & (st0 == kw * CW) & (kw >= 2))
                def _gate_w():
                    _cw_dma(kw - 2, wr, slot_w).wait()

                sw = pl.ds(slot_w, 1)
                cw_win[sw, 0:1, pl.ds(stw, 1)] = u_sh.hi[0:1][None, None]
                cw_win[sw, 1:2, pl.ds(stw, 1)] = u_sh.lo[0:1][None, None]
                cw_win[sw, 2:3, pl.ds(stw, 1)] = \
                    _b2f(u_sh.e[0:1])[None, None]
                cw_win[sw, 3:4, pl.ds(stw, 1)] = w_sh.hi[0:1][None, None]
                cw_win[sw, 4:5, pl.ds(stw, 1)] = w_sh.lo[0:1][None, None]
                cw_win[sw, 5:6, pl.ds(stw, 1)] = \
                    _b2f(w_sh.e[0:1])[None, None]

                @pl.when(valid_w & ((st0 - kw * CW == CW - 1)
                                    | (t == NT - 1)))
                def _flush_w():
                    _cw_dma(kw, wr, slot_w).start()

                ld = jnp.minimum(t + 2, Hcp - 1)
                kr = ld // CW

                @pl.when(ld % CW == 0)
                def _gate_r():
                    _cr_dma(kr, rd).wait()

                @pl.when((ld % CW == 0) & (kr + 1 <= kr_max))
                def _pref_r():
                    _cr_dma(kr + 1, rd).start()

                u_sh = bsel(row0, cread(0, ld), u_sh)
                w_sh = bsel(row0, cread(1, ld), w_sh)

                th = t + 1
                kh = th // CW

                @pl.when(th % CW == 0)
                def _gate_h():
                    _hp_dma(kh).wait()

                @pl.when((th % CW == 0) & (kh + 1 <= kh_max))
                def _pref_h():
                    _hp_dma(kh + 1).start()

                hrow = hp_win[pl.ds(kh % 2, 1),
                              pl.ds(th - kh * CW, 1), :][0]
            else:
                st = jnp.where(st0 >= 1, st0, TRASH)
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

        t_lo = jnp.clip(tlo_ref[b, tile], 0, NT)
        t_hi = jnp.clip(thi_ref[b, tile], t_lo, NT)
        carry = (m_un, y_un, w_p, u_p, u_pp, hd, acc)
        nos = functools.partial(step, sample=False)
        carry = jax.lax.fori_loop(0, t_lo, nos, carry)
        carry = jax.lax.fori_loop(t_lo, t_hi, step, carry)
        carry = jax.lax.fori_loop(t_hi, NT, nos, carry)
        if stream_carry:
            # drain this band's last two write flushes so the next band's
            # reads of this buffer observe completed HBM state
            _cw_dma(kw_last, wr, kw_last % 2).wait()
            if kw_last >= 1:
                _cw_dma(kw_last - 1, wr, (kw_last - 1) % 2).wait()
        return carry[-1]

    zacc = XF(u0.hi * 0.0, u0.hi * 0.0,
              jnp.minimum(u0.e, 0) * 0 + np.int32(E_ZERO))
    acc = jax.lax.fori_loop(0, NB, band, zacc)
    sh_ref[:] = acc.hi
    sl_ref[:] = acc.lo
    se_ref[:] = acc.e


@functools.partial(jax.jit, static_argnames=("band", "interpret", "stream",
                                             "stream_carry", "carry_window"))
def pairhmm_pallas_banded_xf(
    hap,        # (HR, Bp) int32 RAW hap chars (row t = hap base t)
    rchar,      # (Rb, Bp) int32 raw read chars (row k = read base k+1)
    rslen, haplen,               # (1, Bp) int32
    hi_planes, lo_planes,        # (8, Rb, Bp) f32
    e_planes,                    # (8, Rb, Bp) int32
    u0h, u0l, u0e,               # (1, Bp)
    *, band: int = 32, interpret: bool = False, stream: bool = False,
    stream_carry: bool = False, carry_window: int = 256,
):
    """Banded-wavefront extended-range forward.  Returns the (1, Bp)
    score triple (hi, lo, e).  Chars are RAW bytes matched like the spec
    (equality or N-wildcard folded into one-hot upstream).

    ``stream`` streams the transition-plane stacks per band from HBM
    (VMEM independent of read length); ``stream_carry`` keeps the
    6-plane inter-band carry and hap plane in HBM with CW-column
    windows (VMEM independent of hap length) — same tiers as the f32
    production kernel."""
    Rb, Bp = rchar.shape
    HR = hap.shape[0]
    BH = band
    NB = Rb // BH
    H = HR - BH
    NT = H + BH - 1
    Hcp = _round_up(H + BH + 4, 8)
    n_tiles = Bp // LANES

    CW = carry_window
    if stream_carry and HR % CW:
        hap = jnp.pad(hap, ((0, _round_up(HR, CW) - HR), (0, 0)))

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
                               NT=NT, Hcp=Hcp, HR=HR, stream=stream,
                               stream_carry=stream_carry, CW=CW)

    score_spec = pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM)
    out_specs = [score_spec, score_spec, score_spec]
    out_shape = [
        jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        jax.ShapeDtypeStruct((1, Bp), jnp.int32),
    ]
    # the HBM carry rides as a pl.ANY output right after the score triple
    # (Mosaic allows no HBM scratch); its flattened ref position matches
    # the carry-as-first-scratch layout the kernel unpacks
    if stream_carry:
        Hcph = _round_up(Hcp, CW)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((2, 6, Hcph, LANES), jnp.float32))
        carry_scratch = []
        hap_spec = pl.BlockSpec(memory_space=pl.ANY)
        win_scratch = [
            pltpu.VMEM((2, 6, CW, LANES), jnp.float32),      # carry read
            pltpu.VMEM((2, 6, CW + 8, LANES), jnp.float32),  # carry write
            pltpu.VMEM((2, CW, LANES), jnp.int32),           # hap window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        carry_scratch = [pltpu.VMEM((2, 6, Hcp, LANES), jnp.float32)]
        hap_spec = vm((hap.shape[0], LANES))
        win_scratch = []
    if stream:
        in_specs = [
            hap_spec, pl.BlockSpec(memory_space=pl.ANY),
            vm((1, LANES)), vm((1, LANES)),
            sm, sm,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vm((1, LANES)), vm((1, LANES)), vm((1, LANES)),
        ]
        scratch = carry_scratch + [
            pltpu.VMEM((2, 8, BH, LANES), jnp.float32),   # hi band buf
            pltpu.VMEM((2, 8, BH, LANES), jnp.float32),   # lo band buf
            pltpu.VMEM((2, 8, BH, LANES), jnp.int32),     # e band buf
            pltpu.VMEM((2, BH, LANES), jnp.int32),        # read chars
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + win_scratch
    else:
        in_specs = [
            hap_spec, vm((Rb, LANES)), vm((1, LANES)), vm((1, LANES)),
            sm, sm,
            vm3((8, Rb, LANES)), vm3((8, Rb, LANES)), vm3((8, Rb, LANES)),
            vm((1, LANES)), vm((1, LANES)), vm((1, LANES)),
        ]
        scratch = carry_scratch + win_scratch
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_imode(interpret),
    )(hap, rchar, rslen, haplen, tlo.astype(jnp.int32),
      thi.astype(jnp.int32), hi_planes, lo_planes, e_planes, u0h, u0l, u0e)
    return XF(outs[0], outs[1], outs[2])


def _xf_fits_vmem(rdlen: int, haplen: int, budget_mb: float = 12.0) -> bool:
    """xfloat banded working set: 24 transition planes + 12 carry
    columns + hap/char rows."""
    rb = (rdlen + 31) // 32 * 32
    hr = haplen + 40
    est = (25 * rb + hr + 12 * hr + 256) * 128 * 4
    return est <= budget_mb * 1e6


def _xf_fits_stream(rdlen: int, haplen: int, budget_mb: float = 14.0) -> bool:
    """Envelope of the HBM-streaming xf kernel: read length drops out
    (plane stacks stream per band); the 12-plane carry + hap rows stay
    hap-length bound.  Past this, stream_carry windows the carry too and
    no length falls back to the scan."""
    hr = haplen + 40
    est = (hr + 12 * hr + 25 * 2 * 32 + 256) * 128 * 4
    return est <= budget_mb * 1e6


@functools.partial(jax.jit, static_argnames=("band", "interpret", "stream",
                                             "stream_carry"))
def _xf_product_forward(hap, haplen, yih, yil, yie,
                        rchar, rslen, hi_p, lo_p, e_p, g1h, g1l, g1e,
                        ridx, hidx, *, band: int, interpret: bool,
                        stream: bool = False, stream_carry: bool = False):
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
        u0.hi, u0.lo, u0.e, band=band, interpret=interpret,
        stream=stream, stream_carry=stream_carry)


_XF_TABLES: dict = {}


def _xf_tables():
    """Device-resident xf-split CTX_F64 tables: every transition plane is
    a pure gather from one of these (the f64 arithmetic — 1-q, q/3,
    match-to-match — is pre-applied on host ONCE, so the device needs no
    f64 support and the gathered triples are bit-identical to the host
    packer's xf_split of the per-read f64 rows)."""
    if not _XF_TABLES:
        from mgl_tpu.core.context import CTX_F64
        from mgl_tpu.kernels.pairhmm_pallas import BASE_ENC

        ph = np.asarray(CTX_F64.ph2pr, np.float64)
        m2m = np.asarray(CTX_F64.match_to_match, np.float64)
        for name, tab in (("m2m", m2m), ("ph", ph), ("omph", 1.0 - ph),
                          ("ph3", ph * (1.0 / 3.0))):
            _XF_TABLES[name] = tuple(jnp.asarray(a) for a in xf_split(tab))
        _XF_TABLES["enc"] = jnp.asarray(BASE_ENC.astype(np.int32))
        _XF_TABLES["zero"] = tuple(
            np.asarray(a).reshape(())[()] for a in xf_split(np.zeros(1)))
    return _XF_TABLES


def _gather_xf(tab, idx) -> XF:
    return XF(tab[0][idx], tab[1][idx], tab[2][idx])


def _read_planes_device_xf(q, i, d, c, bases, rslen, tabs,
                           *, Rb: int, Bp: int):
    """Device-side xf plane construction from raw uint8 tracks (the xf
    analogue of pairhmm_pallas._read_planes_device; plane order and
    banded row shifts match the host packer this replaces: *_u rows drop
    2, consumer rows drop 1).  Returns (planes XF of (8, Rb, Bp),
    rchar (Rb, Bp) i32, rslen (1, Bp) i32, pgapm1 XF of (1, Bp))."""
    n, rmax = q.shape
    qi = (q & np.uint8(127)).astype(jnp.int32)
    ii = (i & np.uint8(127)).astype(jnp.int32)
    di = (d & np.uint8(127)).astype(jnp.int32)
    ci = (c & np.uint8(127)).astype(jnp.int32)
    mn = jnp.minimum(ii, di)
    mx = jnp.maximum(ii, di)
    zh, zl, ze = tabs["zero"]
    # per-base triples (n, rmax), col j = read base j+1
    vals = (
        _gather_xf(tabs["m2m"], ((mx * (mx + 1)) >> 1) + mn),  # p_mm
        _gather_xf(tabs["omph"], ci),                          # p_gapm
        _gather_xf(tabs["ph"], ii),                            # p_mx
        _gather_xf(tabs["ph"], di),                            # p_my
        _gather_xf(tabs["ph"], ci),                            # p_zz
        _gather_xf(tabs["omph"], qi),                          # dm
        _gather_xf(tabs["ph3"], qi),                           # dmm
    )
    col = jnp.arange(rmax, dtype=jnp.int32)[None, :]
    live = col < rslen[:, None].astype(jnp.int32)

    def devp(v: XF, drop):
        # plane row r = base r+drop (1-based) = col r+drop-1; rows past
        # the read are the xf zero triple (the host packer's 0.0 split)
        h = jnp.where(live, v.hi, zh)[:, drop - 1:].T
        l_ = jnp.where(live, v.lo, zl)[:, drop - 1:].T
        e = jnp.where(live, v.e, ze)[:, drop - 1:].T
        rows = rmax - (drop - 1)
        return XF(
            jnp.full((Rb, Bp), zh, jnp.float32).at[:rows, :n].set(h),
            jnp.full((Rb, Bp), zl, jnp.float32).at[:rows, :n].set(l_),
            jnp.full((Rb, Bp), ze, jnp.int32).at[:rows, :n].set(e),
        )

    p_mm, p_gapm, p_mx, p_my, p_zz, dm, dmm = vals
    order = ((p_mm, 2), (p_gapm, 2), (p_mx, 2), (p_zz, 2),
             (p_my, 1), (p_zz, 1), (dm, 1), (dmm, 1))
    ps = [devp(v, drop) for v, drop in order]
    planes = XF(jnp.stack([p.hi for p in ps]),
                jnp.stack([p.lo for p in ps]),
                jnp.stack([p.e for p in ps]))
    rchar = jnp.zeros((Rb, Bp), jnp.int32).at[:rmax, :n].set(
        (tabs["enc"][bases.astype(jnp.int32)] * live).T)
    rsl = jnp.zeros((1, Bp), jnp.int32).at[0, :n].set(
        rslen.astype(jnp.int32))
    g1 = _gather_xf(tabs["omph"], ci[:, 0])
    pgapm1 = XF(
        jnp.full((1, Bp), zh, jnp.float32).at[0, :n].set(g1.hi),
        jnp.full((1, Bp), zl, jnp.float32).at[0, :n].set(g1.lo),
        jnp.full((1, Bp), ze, jnp.int32).at[0, :n].set(g1.e),
    )
    return planes, rchar, rsl, pgapm1


@functools.partial(jax.jit, static_argnames=("Rb", "band", "interpret",
                                             "stream", "stream_carry"))
def _xf_product_forward_tracks(q, i, d, c, bases, rlens,
                               hap, haplen, yih, yil, yie,
                               ridx, hidx, tabs, *, Rb, band, interpret,
                               stream, stream_carry):
    planes, rchar, rsl, g1 = _read_planes_device_xf(
        q, i, d, c, bases, rlens, tabs, Rb=Rb, Bp=q.shape[0])
    s = _xf_product_forward(
        hap, haplen, yih, yil, yie, rchar, rsl,
        planes.hi, planes.lo, planes.e, g1.hi, g1.lo, g1.e,
        ridx, hidx, band=band, interpret=interpret, stream=stream,
        stream_carry=stream_carry)
    # one packed (3, Bp) INT32 result: bitcast(hi), bitcast(lo), e — a
    # single device->host fetch instead of three serialized round trips
    # (the tunnel charges ~25 ms per synchronous transfer).  The pack
    # must ride in int32, not f32: int32 exponents bitcast to f32 are
    # denormal/NaN bit patterns, and XLA:TPU flushes denormals to zero
    # and canonicalizes NaNs even in pure data movement (measured — this
    # zeroed every rescue exponent on hardware while the CPU interpreter,
    # which preserves denormals, stayed bit-exact).
    return jnp.stack([jax.lax.bitcast_convert_type(s.hi[0], jnp.int32),
                      jax.lax.bitcast_convert_type(s.lo[0], jnp.int32),
                      s.e[0]])


def rescue_scores_xf_banded(reads: list[dict], haps: list[np.ndarray],
                            pairs: list[tuple[int, int]],
                            pad_to: tuple[int, int] | None = None,
                            stream: bool = False,
                            stream_carry: bool = False,
                            async_result: bool = False):
    """Banded-kernel rescue scores: (B,) f64, 2^1020-scaled (the drop-in
    fast path for ops/xfloat.rescue_scores_xf).  The host ships only raw
    uint8 quality tracks; the xf transition planes are table gathers on
    device (_read_planes_device_xf)."""
    from mgl_tpu.core.context import CTX_F64
    from mgl_tpu.kernels.pairhmm_pallas import (BASE_ENC, _stack_tracks,
                                                env_interpret)
    from mgl_tpu.ops.xfloat import xf_to_f64

    B = len(pairs)
    band = 32
    ur = sorted({ri for ri, _ in pairs})
    uh = sorted({hi for _, hi in pairs})
    rmax = max(len(reads[ri]["bases"]) for ri in ur)
    hmax = max(len(haps[hi]) for hi in uh)
    if pad_to is not None:
        rmax, hmax = max(rmax, pad_to[0]), max(hmax, pad_to[1])
    Bp = _round_up(max(B, 1), LANES)
    Rb = _round_up(rmax, band)
    HR = hmax + band
    n_h = len(uh)

    q, i, d, c, rbases, rlens = _stack_tracks([reads[ri] for ri in ur])
    if q.shape[1] < rmax:            # pad tracks to the bucket's rmax
        padw = ((0, 0), (0, rmax - q.shape[1]))
        q, i, d, c, rbases = (np.pad(a, padw) for a in (q, i, d, c, rbases))

    hap_a = np.zeros((HR, n_h), np.int32)
    haplen = np.zeros((1, n_h), np.int32)
    y_init = np.zeros((1, n_h), np.float64)
    for k, hi in enumerate(uh):
        hp = haps[hi]
        hap_a[: len(hp), k] = BASE_ENC[np.asarray(hp)]
        haplen[0, k] = len(hp)
        y_init[0, k] = float(CTX_F64.initial_constant) / float(len(hp))
    haplen = np.maximum(haplen, 1)

    pi = np.asarray(pairs, np.int64).reshape(-1, 2)
    ridx = np.zeros(Bp, np.int64)
    hidx = np.zeros(Bp, np.int64)
    ridx[:B] = np.searchsorted(np.asarray(ur), pi[:, 0])
    hidx[:B] = np.searchsorted(np.asarray(uh), pi[:, 1])

    yih, yil, yie = xf_split(y_init)
    tabs = _xf_tables()
    packed_dev = _xf_product_forward_tracks(
        jnp.asarray(q), jnp.asarray(i), jnp.asarray(d), jnp.asarray(c),
        jnp.asarray(rbases), jnp.asarray(rlens),
        jnp.asarray(hap_a), jnp.asarray(haplen),
        jnp.asarray(yih), jnp.asarray(yil), jnp.asarray(yie),
        jnp.asarray(ridx), jnp.asarray(hidx), tabs,
        Rb=Rb, band=band, interpret=env_interpret(),
        stream=stream, stream_carry=stream_carry)

    # begin the device->host copy in the background (non-blocking): a
    # pipelined caller's finish() then reads local bytes instead of
    # paying a synchronous tunnel round trip
    try:
        packed_dev.copy_to_host_async()
    except (AttributeError, RuntimeError):  # pragma: no cover
        pass

    def finish() -> np.ndarray:
        packed = np.asarray(packed_dev)
        return xf_to_f64(packed[0, :B].view(np.float32),
                         packed[1, :B].view(np.float32),
                         packed[2, :B])

    if async_result:
        return finish
    return finish()

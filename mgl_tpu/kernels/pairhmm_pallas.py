"""Pallas TPU kernel for the batched PairHMM forward pass.

Performance path of ops/pairhmm.py — identical recurrence and scaling
(compute_prob_scalar.cc:39-43 / Context<float>), with all three DP state
planes (M/X/Y, two-diagonal history each) carried in vector registers /
VMEM by the compiler:

* grid over batch tiles: 128 (read, hap) pairs per tile, one per lane;
* read rows in sublanes; per-diagonal dependency handled by cross-sublane
  rolls; haplotype characters stream through a rolling diagonal register;
* **boundary-free recurrence**: inputs are laid out so the DP boundary
  conditions sustain themselves — row 0 carries Y = yInitial because
  p_zz[0] = 1 and every other transition row 0 is zero; rows beyond the
  read length stay exactly 0 because their transition rows are zero, and
  one guaranteed-zero row at the bottom makes the circular cross-sublane
  roll equivalent to a zero-fill shift.  No per-step masking of row 0 /
  column 0 is needed (the reference masks implicitly via its 3-phase
  loop structure, compute_prob_scalar.cc:146-317);
* bases are one-hot encoded (A=1, C=2, G=4, T=8, N=15) so the
  match-or-ambiguous test is a single AND + compare — the TPU analogue of
  ComputeDistm_ps's sign-bit trick (compute_prob_avxf.cc:48-61);
* rolled copies of each new diagonal are produced once and re-used by both
  downstream consumers, cutting cross-sublane shifts to 4 per diagonal;
* the last-row (M+X) contribution is accumulated on the fly, so the only
  output is one f32 score per pair — no DP state ever reaches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# one-hot base encoding; anything outside ACGTN never matches
BASE_ENC = np.zeros(256, np.int32)
for _ch, _v in ((b"Aa", 1), (b"Cc", 2), (b"Gg", 4), (b"Tt", 8), (b"Nn", 15)):
    for _c in _ch:
        BASE_ENC[_c] = _v


from mgl_tpu.utils import round_up as _round_up  # shared helper


def env_interpret() -> bool:
    """Whether to run Pallas kernels under the TPU interpreter (CPU tests /
    multi-chip dry-runs; MGL_TPU_PALLAS_INTERPRET=1)."""
    import os

    return os.environ.get("MGL_TPU_PALLAS_INTERPRET") == "1"


def _imode(interpret: bool):
    return pltpu.InterpretParams() if interpret else False


def _pairhmm_kernel(
    hpad_ref, rchar_ref, rslen_ref, haplen_ref,
    p_mm_ref, p_gapm_ref, p_mx_ref, p_my_ref, p_zz_ref,
    dm_ref, dmm_ref, y_init_ref,
    score_ref,
    *,
    R1p: int, HP: int, D: int,
):
    row = jax.lax.broadcasted_iota(jnp.int32, (R1p, LANES), 0)
    rchar = rchar_ref[:]
    p_mm, p_gapm = p_mm_ref[:], p_gapm_ref[:]
    p_mx, p_my, p_zz = p_mx_ref[:], p_my_ref[:], p_zz_ref[:]
    dm, dmm = dm_ref[:], dmm_ref[:]
    y_init = y_init_ref[0:1, :]            # (1, LANES)
    rl_row = rslen_ref[0:1, :]
    hl_row = haplen_ref[0:1, :]
    mask_last = row == rl_row
    row0 = row == 0

    zero = jnp.zeros((R1p, LANES), jnp.float32)
    # diag 0 and diag 1 both have M = X = 0, Y = yInit at row 0.
    y01 = jnp.where(row0, y_init, 0.0)
    # rolled (X + Y) of both: yInit shifted to row 1
    xy_ro_init = jnp.where(row == 1, y_init, 0.0)
    hd0 = jnp.where(row0, hpad_ref[0:1, :], 0)
    acc0 = jnp.zeros((1, LANES), jnp.float32)

    def diag(d, carry):
        """One anti-diagonal.  carry:
        m_p, y_p       unrolled M/Y of diag d-1 (for the Y recurrence)
        m_ro1, x_ro1   rolled M/X of diag d-1 (for the X recurrence)
        xy_ro1         rolled X+Y of diag d-1 (for the next M recurrence)
        m_ro2, xy_ro2  rolled M and X+Y of diag d-2 (for the M recurrence)
        hd             haplotype chars along diag d-1
        acc            running last-row (M+X) sum
        """
        m_p, y_p, m_ro1, x_ro1, xy_ro1, m_ro2, xy_ro2, hd, acc = carry

        hrow = hpad_ref[pl.ds(jnp.minimum(d - 1, HP - 1), 1), :]
        hd = jnp.where(row0, hrow, pltpu.roll(hd, 1, 0))

        distm = jnp.where((rchar & hd) != 0, dm, dmm)
        m_cur = distm * (m_ro2 * p_mm + xy_ro2 * p_gapm)
        y_cur = m_p * p_my + y_p * p_zz
        x_cur = m_ro1 * p_mx + x_ro1 * p_zz

        # last-row contribution: cell (rslen, c=d-rslen), valid 1<=c<=haplen
        contrib = jnp.sum(jnp.where(mask_last, m_cur + x_cur, 0.0),
                          axis=0, keepdims=True)
        c = d - rl_row
        lane_valid = (c >= 1) & (c <= hl_row)
        acc = acc + jnp.where(lane_valid, contrib, 0.0)

        m_ro = pltpu.roll(m_cur, 1, 0)
        x_ro = pltpu.roll(x_cur, 1, 0)
        xy_ro = pltpu.roll(x_cur + y_cur, 1, 0)
        return (m_cur, y_cur, m_ro, x_ro, xy_ro, m_ro1, xy_ro1, hd, acc)

    carry0 = (zero, y01, zero, zero, xy_ro_init, zero, xy_ro_init, hd0, acc0)

    n2 = (D - 2 + 1) // 2

    def body2(k, carry):
        d = 2 + 2 * k
        carry = diag(d, carry)
        carry = diag(d + 1, carry)
        return carry

    final = jax.lax.fori_loop(0, n2, body2, carry0)
    score_ref[:] = final[-1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairhmm_pallas_forward(
    hpad,      # (HP, Bp) int32 one-hot hap chars, HP >= R1p + H
    rchar,     # (R1p, Bp) int32 one-hot read chars per row (row 0 unused)
    rslen,     # (1, Bp) int32
    haplen,    # (1, Bp) int32
    p_mm, p_gapm, p_mx, p_my, p_zz,   # (R1p, Bp) f32; row 0 = (0,0,0,0,1)
    dm, dmm,   # (R1p, Bp) f32 emission rows, row 0 = 0
    y_init,    # (1, Bp) f32
    *,
    interpret: bool = False,
):
    """Returns (1, Bp) f32 INITIAL_CONSTANT-scaled scores."""
    R1p, Bp = rchar.shape
    HP = hpad.shape[0]
    D = HP + 1

    grid = (Bp // LANES,)
    kernel = functools.partial(_pairhmm_kernel, R1p=R1p, HP=HP, D=D)

    def col(i):
        return (0, i)

    vm = lambda shape: pl.BlockSpec(shape, col, memory_space=pltpu.VMEM)

    score = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vm((HP, LANES)), vm((R1p, LANES)), vm((1, LANES)), vm((1, LANES)),
            vm((R1p, LANES)), vm((R1p, LANES)), vm((R1p, LANES)),
            vm((R1p, LANES)), vm((R1p, LANES)),
            vm((R1p, LANES)), vm((R1p, LANES)), vm((1, LANES)),
        ],
        out_specs=pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        interpret=_imode(interpret),
    )(hpad, rchar, rslen, haplen, p_mm, p_gapm, p_mx, p_my, p_zz, dm, dmm, y_init)
    return score


def _pairhmm_banded_kernel(
    *refs,
    BH: int, NB: int, NT: int, Hcp: int, HR: int, stream: bool = False,
    stream_carry: bool = False, CW: int = 256,
):
    """Banded staggered wavefront (the TPU re-derivation of the reference's
    band sweep, compute_prob_avxf.cc:382-607, with pairs in lanes instead of
    read rows):

    * each band covers BH read rows in sublanes; within a band, step t has
      sublane s at matrix column c = t - s + 1 (a diagonal wavefront), so
      the row-above dependency is a one-sublane roll of the previous step;
    * instead of carrying raw M/X/Y, each step pre-multiplies the *next*
      row's transition coefficients into two combined streams
         U(r,c) = M(r,c)*pMM[r+1] + (X(r,c)+Y(r,c))*pGapM[r+1]
         W(r,c) = M(r,c)*pMX[r+1] +  X(r,c)        *pZZ[r+1]
      so the consumers collapse to M = distm * U_shifted and
      X = W_shifted (free), and only two planes roll / cross bands;
    * all DP state for a band lives in vector registers across the column
      sweep — one (U, W) row per column crosses bands through a
      double-buffered VMEM carry array (the analogue of the reference's
      inter-band score/step arrays, sw_avx.cpp:37-49);
    * transition/emission rows are loaded once per band and stay resident;
    * boundary conditions enter through the carry prefill: band 0 reads
      U = yInit*pGapM[1], W = 0 at every column (row-0 semantics).

    In ``stream`` mode (long reads) the per-row planes live in HBM — the
    8 f32 transition/emission planes stacked as one (8, Rb, Bp) array
    plus the one-hot read chars — and (BH, LANES) band slices stream
    through double-buffered VMEM scratch, so VMEM use is independent of
    read length (the reference's O(band x COLS) streaming,
    compute_prob_avxf.cc:663-673).
    """
    refs = list(refs)
    if stream_carry:
        # long-hap mode: the inter-band (U, W) carry planes and the hap
        # character plane live in HBM; CW-column windows stream through
        # double-buffered VMEM (same technique as `stream`, applied to
        # the carry dimension — the reference's O(band x COLS) state,
        # compute_prob_avxf.cc:663-673, with COLS itself windowed)
        cr_win, cw_win, hp_win, cr_sem, cw_sem, hp_sem = refs[-6:]
        refs = refs[:-6]
    if stream:
        (hap_ref, rchar_ref, rslen_ref, haplen_ref, tlo_ref, thi_ref,
         planes_ref, u0_ref, score_ref, carry_ref,
         fl_buf, rc_buf, fl_sem, rc_sem) = refs

        def _band_dma(b, slot):
            tile0 = pl.program_id(0) * LANES
            return (
                pltpu.make_async_copy(
                    planes_ref.at[:, pl.ds(b * BH, BH),
                                  pl.ds(tile0, LANES)],
                    fl_buf.at[slot], fl_sem.at[slot]),
                pltpu.make_async_copy(
                    rchar_ref.at[pl.ds(b * BH, BH), pl.ds(tile0, LANES)],
                    rc_buf.at[slot], rc_sem.at[slot]),
            )

        for d in _band_dma(0, 0):
            d.start()
    else:
        (hap_ref, rchar_ref, rslen_ref, haplen_ref, tlo_ref, thi_ref,
         pmm_u_ref, pgapm_u_ref, pmx_u_ref, pzz_u_ref,
         p_my_ref, p_zz_ref, dm_ref, dmm_ref, u0_ref,
         score_ref, carry_ref) = refs
    row = jax.lax.broadcasted_iota(jnp.int32, (BH, LANES), 0)
    row0 = row == 0
    rsl_row = rslen_ref[0:1, :]
    hl_row = haplen_ref[0:1, :]
    u0 = u0_ref[0:1, :]                  # yInit * pGapM[1]
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
        # row-0 boundary (U = u0, W = 0); buffer 1 zeros so unwritten
        # columns never inject Inf/NaN garbage into the f32 wavefront
        zb = jnp.broadcast_to(u0 * 0.0, (CW, LANES))

        def _init_ck(k, _):
            cw_win[0:1, 0:1, pl.ds(0, CW)] = \
                jnp.broadcast_to(u0, (CW, LANES))[None, None]
            cw_win[0:1, 1:2, pl.ds(0, CW)] = zb[None, None]
            cp = _cw_dma(k, 0, 0)
            cp.start()
            cp.wait()
            cw_win[0:1, 0:1, pl.ds(0, CW)] = zb[None, None]
            cp = _cw_dma(k, 1, 0)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, n_ck, _init_ck, 0)
    else:
        # prefill band-0 read buffer: U = u0, W = 0 (row-0 boundary);
        # write buffer: zeros (column-0 boundary for rows >= 1)
        carry_ref[0:1, 0:1] = jnp.broadcast_to(u0, (Hcp, LANES))[None, None]
        carry_ref[0:1, 1:2] = jnp.zeros((1, 1, Hcp, LANES), jnp.float32)
        carry_ref[1:2] = jnp.zeros((1, 2, Hcp, LANES), jnp.float32)

    def band(b, acc):
        if stream:
            rd2 = b % 2
            for d in _band_dma(b, rd2):
                d.wait()

            @pl.when(b + 1 < NB)
            def _prefetch():
                for d in _band_dma(b + 1, (b + 1) % 2):
                    d.start()

            fl = fl_buf[pl.ds(rd2, 1)][0]
            rch = rc_buf[pl.ds(rd2, 1)][0]
            pmm_u, pgapm_u, pmx_u, pzz_u = fl[0], fl[1], fl[2], fl[3]
            pmy, pzz, dmb, dmmb = fl[4], fl[5], fl[6], fl[7]
        else:
            r = pl.ds(b * BH, BH)
            rch = rchar_ref[r]
            pmm_u, pgapm_u = pmm_u_ref[r], pgapm_u_ref[r]
            pmx_u, pzz_u = pmx_u_ref[r], pzz_u_ref[r]
            pmy, pzz = p_my_ref[r], p_zz_ref[r]
            dmb, dmmb = dm_ref[r], dmm_ref[r]
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

        def cread(plane, idx):
            if stream_carry:
                return cr_win[pl.ds((idx // CW) % 2, 1), pl.ds(plane, 1),
                              pl.ds(idx % CW, 1)][0, 0]
            return carry_ref[pl.ds(rd, 1), pl.ds(plane, 1),
                             pl.ds(idx, 1)][0, 0]

        zero = dmb * 0.0                 # non-replicated zero plane
        # U(r0-1, col 0): band 0 = u0 (Y(0,0)=yInit), else 0
        u_pp = jnp.where(row0, jnp.where(b == 0, u0, 0.0), zero)
        u_p = jnp.where(row0, cread(0, 1), zero)
        w_p = jnp.where(row0, cread(1, 1), zero)
        m_un, y_un = zero, zero
        if stream_carry:
            hd = jnp.where(row0, hp_win[pl.ds(0, 1), 0:1, :][0], 0)
        else:
            hd = jnp.where(row0, hap_ref[0:1, :], 0)

        def step(t, carry, *, sample: bool = True):
            m_un, y_un, w_p, u_p, u_pp, hd, acc = carry

            distm = jnp.where((rch & hd) != 0, dmb, dmmb)
            m_cur = distm * u_pp
            x_cur = w_p
            y_cur = m_un * pmy + y_un * pzz

            if sample:
                # last-row contribution (only the band containing rslen has
                # a nonempty mask); column at that sublane:
                # t + b*BH + 2 - rslen
                contrib = jnp.sum(jnp.where(mask_last, m_cur + x_cur, 0.0),
                                  axis=0, keepdims=True)
                c = t + b * BH + 2 - rsl_row
                valid = (c >= 1) & (c <= hl_row)
                acc = acc + jnp.where(valid, contrib, 0.0)

            u = m_cur * pmm_u + (x_cur + y_cur) * pgapm_u
            w = m_cur * pmx_u + x_cur * pzz_u
            u_sh = pltpu.roll(u, 1, 0)
            w_sh = pltpu.roll(w, 1, 0)

            # band's bottom row (wrapped into sublane 0) -> carry out
            st0 = t - BH + 2
            if stream_carry:
                # windowed carry write: row st0 lands in chunk kw of the
                # write window; a full (or final-partial) chunk flushes
                # to HBM by async DMA.  Pre-wavefront steps (st0 < 1)
                # write the window's trash row (index CW).
                valid_w = st0 >= 1
                kw = jnp.maximum(st0, 0) // CW
                slot_w = kw % 2
                stw = jnp.where(valid_w, st0 - kw * CW, CW)

                @pl.when(valid_w & (st0 == kw * CW) & (kw >= 2))
                def _gate_w():
                    # entering chunk kw: its slot's previous DMA (chunk
                    # kw-2) must have drained before we overwrite it
                    _cw_dma(kw - 2, wr, slot_w).wait()

                cw_win[pl.ds(slot_w, 1), 0:1,
                       pl.ds(stw, 1)] = u_sh[0:1][None, None]
                cw_win[pl.ds(slot_w, 1), 1:2,
                       pl.ds(stw, 1)] = w_sh[0:1][None, None]

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

                u_sh = jnp.where(row0, cread(0, ld), u_sh)
                w_sh = jnp.where(row0, cread(1, ld), w_sh)

                th = t + 1
                kh = th // CW

                @pl.when(th % CW == 0)
                def _gate_h():
                    _hp_dma(kh).wait()

                @pl.when((th % CW == 0) & (kh + 1 <= kh_max))
                def _pref_h():
                    _hp_dma(kh + 1).start()

                hrow = hp_win[pl.ds(kh % 2, 1), pl.ds(th - kh * CW, 1), :][0]
            else:
                st = jnp.where(st0 >= 1, st0, TRASH)
                carry_ref[pl.ds(wr, 1), 0:1,
                          pl.ds(st, 1)] = u_sh[0:1][None, None]
                carry_ref[pl.ds(wr, 1), 1:2,
                          pl.ds(st, 1)] = w_sh[0:1][None, None]

                # carry in: the row above the band at column t+2
                ld = jnp.minimum(t + 2, Hcp - 1)
                u_sh = jnp.where(row0, cread(0, ld), u_sh)
                w_sh = jnp.where(row0, cread(1, ld), w_sh)

                hrow = hap_ref[pl.ds(jnp.minimum(t + 1, HR - 1), 1), :]
            hd = jnp.where(row0, hrow, pltpu.roll(hd, 1, 0))

            return (m_cur, y_cur, w_sh, u_sh, u_p, hd, acc)

        # contrib is nonzero only while some lane's last-row sublane sits
        # in a valid column: split the sweep so the other steps skip it
        tile = pl.program_id(0)
        t_lo = jnp.clip(tlo_ref[b, tile], 0, NT)
        t_hi = jnp.clip(thi_ref[b, tile], t_lo, NT)
        carry = (m_un, y_un, w_p, u_p, u_pp, hd, acc)
        nos = functools.partial(step, sample=False)
        carry = jax.lax.fori_loop(0, t_lo, nos, carry)
        carry = jax.lax.fori_loop(t_lo, t_hi, step, carry)
        carry = jax.lax.fori_loop(t_hi, NT, nos, carry)
        if stream_carry:
            # drain this band's last two write flushes (earlier chunks
            # were gated in-loop at chunk entry) so the next band's reads
            # of this buffer observe completed HBM state
            _cw_dma(kw_last, wr, kw_last % 2).wait()
            if kw_last >= 1:
                _cw_dma(kw_last - 1, wr, (kw_last - 1) % 2).wait()
        return carry[-1]

    acc = jax.lax.fori_loop(0, NB, band,
                            jnp.zeros((1, LANES), jnp.float32))
    score_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "stream",
                                    "stream_carry", "carry_window"))
def pairhmm_pallas_banded(
    hap,       # (HR, Bp) int32 one-hot hap chars (row t = hap base t)
    rchar,     # (Rb, Bp) int32 one-hot read chars (row k = read base k+1)
    rslen,     # (1, Bp) int32
    haplen,    # (1, Bp) int32
    pmm_u, pgapm_u, pmx_u, pzz_u,   # (Rb, Bp) f32 (row k = matrix row k+2)
    p_my, p_zz,                      # (Rb, Bp) f32 (row k = matrix row k+1)
    dm, dmm,   # (Rb, Bp) f32 emissions (row k = matrix row k+1)
    u0,        # (1, Bp) f32: yInit * pGapM[1]
    *,
    band: int = 32,
    interpret: bool = False,
    stream: bool = False,
    stream_carry: bool = False,
    carry_window: int = 256,
):
    """Banded-wavefront forward.  Returns (1, Bp) f32 scaled scores."""
    Rb, Bp = rchar.shape
    HR = hap.shape[0]
    BH = band
    NB = Rb // BH
    H = HR - BH                        # prepare pads hap rows to H + BH
    NT = H + BH - 1
    Hcp = _round_up(H + BH + 4, 8)

    CW = carry_window
    if stream_carry and HR % CW:
        # hap rows pad up to the DMA chunk size (chunk k spans rows
        # [k*CW, (k+1)*CW); reads never pass NT <= HR-1, pad is dead)
        hap = jnp.pad(hap, ((0, _round_up(HR, CW) - HR), (0, 0)))

    n_tiles = Bp // LANES
    grid = (n_tiles,)
    kernel = functools.partial(_pairhmm_banded_kernel, BH=BH, NB=NB, NT=NT,
                               Hcp=Hcp, HR=HR, stream=stream,
                               stream_carry=stream_carry, CW=CW)

    # per-(band, tile) contrib windows: lane's last-row sublane is active
    # for t in [rslen - b*BH - 1, rslen - b*BH - 1 + haplen)
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
    sm = pl.BlockSpec((NB, n_tiles), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)

    # In stream_carry (long-hap) mode the inter-band (U, W) carry lives in
    # HBM and CW-column windows stream through VMEM.  Mosaic only allows
    # vmem/smem/semaphore *scratch*, so the HBM buffer rides as an extra
    # pl.ANY output (discarded) placed right after score — the kernel's
    # flattened ref order matches the carry-as-first-scratch VMEM layout.
    out_specs = [pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((1, Bp), jnp.float32)]
    if stream_carry:
        Hcph = _round_up(Hcp, CW)
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((2, 2, Hcph, LANES), jnp.float32))
        carry_scratch = []
        hap_spec = pl.BlockSpec(memory_space=pl.ANY)
        win_scratch = [
            pltpu.VMEM((2, 2, CW, LANES), jnp.float32),      # carry read
            pltpu.VMEM((2, 2, CW + 8, LANES), jnp.float32),  # carry write
            pltpu.VMEM((2, CW, LANES), jnp.int32),           # hap window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        carry_scratch = [pltpu.VMEM((2, 2, Hcp, LANES), jnp.float32)]
        hap_spec = vm((hap.shape[0], LANES))
        win_scratch = []
    if stream:
        # long-read mode: per-row planes live in HBM (8 f32 planes stacked
        # into one array + one-hot read chars); the kernel streams band
        # slices through double-buffered VMEM scratch, so VMEM use is
        # independent of read length
        planes = jnp.stack([pmm_u, pgapm_u, pmx_u, pzz_u,
                            p_my, p_zz, dm, dmm])
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                hap_spec, pl.BlockSpec(memory_space=pl.ANY),
                vm((1, LANES)), vm((1, LANES)),
                sm, sm,
                pl.BlockSpec(memory_space=pl.ANY),
                vm((1, LANES)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=carry_scratch + [
                pltpu.VMEM((2, 8, BH, LANES), jnp.float32),
                pltpu.VMEM((2, BH, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ] + win_scratch,
            interpret=_imode(interpret),
        )(hap, rchar, rslen, haplen, tlo.astype(jnp.int32),
          thi.astype(jnp.int32), planes, u0)
        return outs[0]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            hap_spec, vm((Rb, LANES)), vm((1, LANES)), vm((1, LANES)),
            sm, sm,
            vm((Rb, LANES)), vm((Rb, LANES)), vm((Rb, LANES)), vm((Rb, LANES)),
            vm((Rb, LANES)), vm((Rb, LANES)),
            vm((Rb, LANES)), vm((Rb, LANES)), vm((1, LANES)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=carry_scratch + win_scratch,
        interpret=_imode(interpret),
    )(hap, rchar, rslen, haplen, tlo.astype(jnp.int32), thi.astype(jnp.int32),
      pmm_u, pgapm_u, pmx_u, pzz_u,
      p_my, p_zz, dm, dmm, u0)
    return outs[0]


def _pairhmm_shared_kernel(
    hstream_ref, rchar_ref, rslen_ref, segtab_ref, mn_ref, mx_ref,
    pmm_u_ref, pgapm_u_ref, pmx_u_ref, pzz_u_ref,
    p_my_ref, p_zz_ref, dm_ref, dmm_ref, u0_ref,
    score_ref,
    carry_ref,                 # scratch (2, 2, Scp, LANES) f32: U / W
    chkf_ref,                  # scratch (5, BH, LANES) f32 checkpoint
    chki_ref,                  # scratch (1, BH, LANES) i32 checkpoint (hd)
    chka_ref,                  # scratch (1, LANES) f32 checkpoint (acc)
    *,
    BH: int, NB: int, NS: int, Scp: int, SR: int,
):
    """Banded wavefront over a SHARED haplotype set with prefix sharing.

    TPU re-derivation of the reference's haplotype column cache
    (compute_prob_avxf.cc:943-967 save / 1068-1071 partial-sum seed):
    lanes hold 128 *reads* against one hap set; the kernel sweeps the
    concatenation of each haplotype's distinct-suffix columns (segment j =
    columns pos_j+1..len_j).  Because columns <= pos_j are bit-identical
    between consecutive haplotypes (same shared yInitial = IC/COLS_MAX,
    same chars), the staggered register wavefront at the step where
    sublane 0 sits on column pos_{j+1} is exactly the state a from-scratch
    sweep of hap j+1 would reach — so it is snapshotted into VMEM
    (chk refs) and restored at segment j+1's start.  Only three row-0
    entries look *ahead* of the boundary (the carry-in pipeline u_p/w_p
    and the hap-char head hd), and those are re-spliced from segment
    j+1's own stream slots on restore.  The running last-row sum rides
    the checkpoint, seeding each hap's partial result.

    Inter-band (U, W) carries are indexed by *stream* position: slot
    base_j + o holds column pos_j+1+o of segment j, so consecutive bands'
    reads and writes line up without rewinds.  segtab rows (SMEM i32):
    0 = stream base, 1 = pos, 2 = haplen, 3 = sweep steps T
    (= seg_len + BH - 1), 4 = checkpoint step (pos_{j+1} - pos_j, or -1).

    Last-row sampling is windowed like the per-pair banded kernel:
    mn/mx (NB, n_tiles) hold min/max over the tile's lanes (whose last
    row falls in band b) of rslen - b*BH - 1; segment j's sample window
    is [mn - pos_j, mx - pos_j + len_j) clipped to [0, T].  The
    checkpoint save runs as a predicated step (t == ts) so the window
    split stays a clean three-way loop.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (BH, LANES), 0)
    row0 = row == 0
    rsl_row = rslen_ref[0:1, :]
    u0 = u0_ref[0:1, :]
    TRASH = Scp - 1

    # band-0 read buffer: U = u0 at every column (row-0 boundary), W = 0;
    # write buffer zeros (column boundary for fresh segments)
    carry_ref[0:1, 0:1] = jnp.broadcast_to(u0, (Scp, LANES))[None, None]
    carry_ref[0:1, 1:2] = jnp.zeros((1, 1, Scp, LANES), jnp.float32)
    carry_ref[1:2] = jnp.zeros((1, 2, Scp, LANES), jnp.float32)

    def band(b, _):
        r = pl.ds(b * BH, BH)
        rch = rchar_ref[r]
        pmm_u, pgapm_u = pmm_u_ref[r], pgapm_u_ref[r]
        pmx_u, pzz_u = pmx_u_ref[r], pzz_u_ref[r]
        pmy, pzz = p_my_ref[r], p_zz_ref[r]
        dmb, dmmb = dm_ref[r], dmm_ref[r]
        mask_last = (row + b * BH + 1) == rsl_row
        rd = b % 2
        wr = (b + 1) % 2

        def cread(plane, idx):
            return carry_ref[pl.ds(rd, 1), pl.ds(plane, 1),
                             pl.ds(idx, 1)][0, 0]

        zero = dmb * 0.0                 # non-replicated zero plane

        def seg(j, _):
            base = segtab_ref[0, j]
            pos = segtab_ref[1, j]
            lenj = segtab_ref[2, j]
            T = segtab_ref[3, j]
            tsv = segtab_ref[4, j]
            fresh = pos == 0
            base_c = jnp.minimum(base, Scp - 1)

            # entry wavefront: fresh boundary state or restored checkpoint;
            # row-0 look-ahead (u_p, w_p, hd head) always re-spliced from
            # this segment's own stream
            m_un = jnp.where(fresh, zero, chkf_ref[0:1][0])
            y_un = jnp.where(fresh, zero, chkf_ref[1:2][0])
            w_p = jnp.where(row0, cread(1, base_c),
                            jnp.where(fresh, zero, chkf_ref[2:3][0]))
            u_p = jnp.where(row0, cread(0, base_c),
                            jnp.where(fresh, zero, chkf_ref[3:4][0]))
            u_pp = jnp.where(fresh,
                             jnp.where(row0 & (b == 0), u0, zero),
                             chkf_ref[4:5][0])
            hrow0 = hstream_ref[pl.ds(jnp.minimum(base, SR - 1), 1), :]
            hd = jnp.where(row0, hrow0,
                           jnp.where(fresh, 0, chki_ref[0:1][0]))
            acc = jnp.where(fresh, u0 * 0.0, chka_ref[0:1, :])

            ts = jnp.clip(jnp.where(tsv < 0, T, tsv), 0, T)

            def step(t, carry, *, sample: bool):
                m_un, y_un, w_p, u_p, u_pp, hd, acc = carry

                # checkpoint: snapshot the entry wavefront of step ts (the
                # state a from-scratch sweep of the next hap would reach
                # at its shared-prefix boundary)
                @pl.when(t == ts)
                def _save():
                    chkf_ref[0:1] = m_un[None]
                    chkf_ref[1:2] = y_un[None]
                    chkf_ref[2:3] = w_p[None]
                    chkf_ref[3:4] = u_p[None]
                    chkf_ref[4:5] = u_pp[None]
                    chki_ref[0:1] = hd[None]
                    chka_ref[0:1, :] = acc

                distm = jnp.where((rch & hd) != 0, dmb, dmmb)
                m_cur = distm * u_pp
                x_cur = w_p
                y_cur = m_un * pmy + y_un * pzz

                if sample:
                    contrib = jnp.sum(
                        jnp.where(mask_last, m_cur + x_cur, 0.0),
                        axis=0, keepdims=True)
                    c = pos + t + b * BH + 2 - rsl_row
                    valid = (c >= 1) & (c <= lenj)
                    acc = acc + jnp.where(valid, contrib, 0.0)

                u = m_cur * pmm_u + (x_cur + y_cur) * pgapm_u
                w = m_cur * pmx_u + x_cur * pzz_u
                u_sh = pltpu.roll(u, 1, 0)
                w_sh = pltpu.roll(w, 1, 0)

                # bottom-row carry out, in stream coordinates; ramp-in and
                # ramp-out junk (outside this segment's columns) -> TRASH
                cw = pos + t + 2 - BH
                st = base + t + 1 - BH
                st = jnp.where((t >= BH - 1) & (cw <= lenj), st, TRASH)
                carry_ref[pl.ds(wr, 1), 0:1, pl.ds(st, 1)] = \
                    u_sh[0:1][None, None]
                carry_ref[pl.ds(wr, 1), 1:2, pl.ds(st, 1)] = \
                    w_sh[0:1][None, None]

                ld = jnp.minimum(base + t + 1, Scp - 1)
                u_sh = jnp.where(row0, cread(0, ld), u_sh)
                w_sh = jnp.where(row0, cread(1, ld), w_sh)

                hrow = hstream_ref[pl.ds(jnp.minimum(base + t + 1, SR - 1),
                                         1), :]
                hd = jnp.where(row0, hrow, pltpu.roll(hd, 1, 0))

                return (m_cur, y_cur, w_sh, u_sh, u_p, hd, acc)

            tile = pl.program_id(0)
            wlo = jnp.clip(mn_ref[b, tile] - pos, 0, T)
            whi = jnp.clip(mx_ref[b, tile] - pos + lenj, wlo, T)
            carry = (m_un, y_un, w_p, u_p, u_pp, hd, acc)
            nos = functools.partial(step, sample=False)
            smp = functools.partial(step, sample=True)
            carry = jax.lax.fori_loop(0, wlo, nos, carry)
            carry = jax.lax.fori_loop(wlo, whi, smp, carry)
            carry = jax.lax.fori_loop(whi, T, nos, carry)
            # a checkpoint at the very end of the sweep (ts == T) is taken
            # here; ts < T checkpoints fired inside the loops
            @pl.when(ts == T)
            def _save_end():
                chkf_ref[0:1] = carry[0][None]
                chkf_ref[1:2] = carry[1][None]
                chkf_ref[2:3] = carry[2][None]
                chkf_ref[3:4] = carry[3][None]
                chkf_ref[4:5] = carry[4][None]
                chki_ref[0:1] = carry[5][None]
                chka_ref[0:1, :] = carry[6]

            prev = score_ref[pl.ds(j, 1), :]
            score_ref[pl.ds(j, 1), :] = jnp.where(
                b == 0, carry[6], prev + carry[6])
            return 0

        jax.lax.fori_loop(0, NS, seg, 0)
        return 0

    jax.lax.fori_loop(0, NB, band, 0)


@functools.partial(jax.jit, static_argnames=("scp", "band", "interpret"))
def pairhmm_pallas_shared(
    hstream,   # (SR, LANES) int32 one-hot distinct-suffix char stream
    rchar,     # (Rb, Bp) int32 one-hot read chars (row k = read base k+1)
    rslen,     # (1, Bp) int32
    segtab,    # (5, NSp) int32 segment table (see kernel docstring)
    pmm_u, pgapm_u, pmx_u, pzz_u,   # (Rb, Bp) f32 (row k = matrix row k+2)
    p_my, p_zz,                      # (Rb, Bp) f32 (row k = matrix row k+1)
    dm, dmm,   # (Rb, Bp) f32 emissions (row k = matrix row k+1)
    u0,        # (1, Bp) f32: yInit_shared * pGapM[1]
    *,
    scp: int,
    band: int = 32,
    interpret: bool = False,
):
    """Prefix-sharing forward over one hap set.  Returns (NSp, Bp) f32
    scores scaled by yInit_shared = IC/COLS_MAX (host rescales by
    COLS_MAX/haplen, compute_prob_avxf.cc:1086)."""
    Rb, Bp = rchar.shape
    SR = hstream.shape[0]
    NSp = segtab.shape[1]
    BH = band
    NB = Rb // BH

    n_tiles = Bp // LANES
    kernel = functools.partial(_pairhmm_shared_kernel, BH=BH, NB=NB,
                               NS=NSp, Scp=scp, SR=SR)

    # per-(band, tile) last-row step extents: lane with read length rsl
    # contributes at segment-local steps t1 - pos .. t1 - pos + lenj with
    # t1 = rsl - b*BH - 1, iff its last row falls in band b
    rsl = rslen[0].astype(jnp.int32)
    lane_band = (rsl - 1) // BH
    bands = jnp.arange(NB, dtype=jnp.int32)[:, None]
    t1 = rsl[None, :] - bands * BH - 1
    in_band = (lane_band[None, :] == bands) & (rsl[None, :] >= 1)
    BIG = jnp.int32(1 << 30)
    mn = jnp.min(jnp.where(in_band, t1, BIG).reshape(NB, n_tiles, LANES),
                 axis=2)
    mx = jnp.max(jnp.where(in_band, t1, -BIG).reshape(NB, n_tiles, LANES),
                 axis=2)

    def col(i):
        return (0, i)

    vm = lambda shape: pl.BlockSpec(shape, col, memory_space=pltpu.VMEM)
    bc = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    sm = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)

    score = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            bc((SR, LANES)), vm((Rb, LANES)), vm((1, LANES)),
            sm((5, NSp)), sm((NB, n_tiles)), sm((NB, n_tiles)),
            vm((Rb, LANES)), vm((Rb, LANES)), vm((Rb, LANES)),
            vm((Rb, LANES)),
            vm((Rb, LANES)), vm((Rb, LANES)),
            vm((Rb, LANES)), vm((Rb, LANES)), vm((1, LANES)),
        ],
        out_specs=pl.BlockSpec((NSp, LANES), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSp, Bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, scp, LANES), jnp.float32),
            pltpu.VMEM((5, BH, LANES), jnp.float32),
            pltpu.VMEM((1, BH, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
        ],
        interpret=_imode(interpret),
    )(hstream, rchar, rslen, segtab, mn, mx,
      pmm_u, pgapm_u, pmx_u, pzz_u, p_my, p_zz, dm, dmm, u0)
    return score


def shared_vmem_bytes(rdlen: int, stream: int, n_segs: int,
                      band: int = 32) -> int:
    """Estimated per-tile VMEM working set of the shared kernel.

    Must mirror forward_scores_shared's BUCKETED scp: the launch rounds
    the stream length up to a compile-shape bucket (up to 8192), so a
    budget computed from the raw stream length under-estimates by up to
    ~2x — a hap set whose raw estimate fit could OOM scoped VMEM at the
    bucketed shape (observed with low-sharing sets: 16.09M vs the 16M
    scoped limit)."""
    from mgl_tpu.batch.bucketing import bucket_dims

    Rb = _round_up(max(rdlen, 1), band)
    scp = _round_up(bucket_dims(stream + band + 2,
                                (256, 512, 1024, 2048, 4096, 8192)), 8)
    sr = scp
    nsp = _round_up(bucket_dims(max(n_segs, 1), (8, 16, 32, 64, 128)), 8)
    return 4 * (9 * Rb * LANES + sr * LANES + 4 * scp * LANES
                + 6 * band * LANES + nsp * LANES + 8 * LANES)


def forward_scores_shared(reads: list[dict], haps: list[np.ndarray],
                          band: int = 32, share: bool = True,
                          pad_rdlen: int = 0,
                          cols_max: int | None = None,
                          async_result: bool = False):
    """(n_reads, n_haps) f32 scores via the prefix-sharing shared-hap-set
    kernel.  Scores follow the reference avxf variant: shared
    yInitial = IC/COLS_MAX with a final * COLS_MAX/haplen rescale
    (compute_prob_avxf.cc:661,1086) — within the 1e-5 log10 contract of
    the scalar spec, not bit-identical to it (the reference's own float
    kernels differ the same way)."""
    from mgl_tpu.core.context import CTX_F32
    from mgl_tpu.ops.pairhmm import compute_haplotype_similarities

    n_reads, n_haps = len(reads), len(haps)
    positions, _, cmax = compute_haplotype_similarities(haps)
    # callers chunking one hap set pass the whole set's COLS_MAX so the
    # shared yInitial (and therefore every score bit) is chunk-invariant
    cols_max = cmax if cols_max is None else cols_max
    if not share:        # test hook: full sweeps, must be bit-identical
        positions = np.zeros_like(positions)

    # host ships raw uint8 tracks; transition planes build on device
    # (_read_planes_device) — 6x less transfer than shipping f32 planes
    q, i, d, c, rbases, rlens = _stack_tracks(reads)
    rmax = int(rlens.max())
    Rb = _round_up(max(rmax, pad_rdlen), band)
    Bp = _round_up(max(n_reads, 1), LANES)

    # segment table + distinct-suffix char stream (bucketed shapes)
    seg_len = [len(h) - int(positions[j]) for j, h in enumerate(haps)]
    bases = np.concatenate([[0], np.cumsum(seg_len)]).astype(np.int64)
    S = int(bases[-1])
    from mgl_tpu.batch.bucketing import bucket_dims

    scp = _round_up(bucket_dims(S + band + 2,
                                (256, 512, 1024, 2048, 4096, 8192)), 8)
    SR = scp
    NSp = _round_up(bucket_dims(max(n_haps, 1), (8, 16, 32, 64, 128)), 8)

    hstream = np.zeros((SR, LANES), np.int32)
    segtab = np.zeros((5, NSp), np.int32)
    segtab[3, n_haps:] = 0                    # pad segments: no steps
    segtab[4, :] = -1
    for j, h in enumerate(haps):
        p = int(positions[j])
        hstream[bases[j]: bases[j + 1], :] = BASE_ENC[
            np.asarray(h)[p:, None]]
        segtab[0, j] = bases[j]
        segtab[1, j] = p
        segtab[2, j] = len(h)
        segtab[3, j] = seg_len[j] + band - 1
        if j + 1 < n_haps and positions[j + 1] > 0:
            segtab[4, j] = int(positions[j + 1]) - p
    segtab[0, n_haps:] = S

    y_shared = np.float32(CTX_F32.initial_constant) / np.float32(cols_max)

    import jax.numpy as jnp

    ph2pr, m2m, enc = _ctx_tables_f32()
    score = _shared_forward_tracks(
        jnp.asarray(hstream), jnp.asarray(segtab),
        jnp.asarray(q), jnp.asarray(i), jnp.asarray(d), jnp.asarray(c),
        jnp.asarray(rbases), jnp.asarray(rlens),
        jnp.float32(y_shared), ph2pr, m2m, enc,
        Rb=Rb, Bp=Bp, scp=scp, band=band, interpret=env_interpret())

    # start the device->host transfer as soon as the kernel completes
    # (non-blocking; ~0.5 ms to issue on the dev tunnel): by the time a
    # pipelined caller's finish() runs, the bytes are already host-side
    # and np.asarray costs ~0 instead of a ~25 ms synchronous round trip
    try:
        score.copy_to_host_async()
    except (AttributeError, RuntimeError):  # pragma: no cover
        pass

    def finish() -> np.ndarray:
        raw = np.asarray(score)[:n_haps, :n_reads].astype(np.float64)
        # final rescale, float factors as in the reference (avxf.cc:1086)
        lens = np.array([np.float32(len(h)) for h in haps], np.float64)
        out = raw * float(np.float32(cols_max)) / lens[:, None]
        return out.T.copy()                  # (n_reads, n_haps)

    if async_result:
        # deferred fetch: the kernel is dispatched (device queue), the
        # host keeps working; finish() materializes when called
        return finish
    return finish()


def prepare_inputs_banded(batch, band: int = 32):
    """PairHMMBatch -> lane-major arrays for pairhmm_pallas_banded.

    Row k of p_my/p_zz/dm/dmm/rchar is matrix row k+1 (the unused row 0 is
    dropped so band slices stay 8-aligned); the *_u coefficient arrays are
    shifted one further (row k = matrix row k+2, zero-padded past the read)
    so the kernel's pre-multiplied U/W streams use the next row's
    transitions.
    """
    B, R = batch.rchar.shape          # R = rmax + 1 (row 0 unused)
    H = batch.hap.shape[1]
    Bp = _round_up(max(B, 1), LANES)
    Rb = _round_up(R - 1, band)
    HR = H + band                      # hap rows incl. ramp slack

    def pad_rows(a, rows, dtype, drop: int = 0):
        src = a.T[drop:]
        out = np.zeros((rows, Bp), dtype)
        out[: src.shape[0], :B] = src
        return out

    u0 = (batch.y_init * batch.p_gapm[:, 1]).astype(np.float32)
    args = dict(
        hap=pad_rows(BASE_ENC[batch.hap], HR, np.int32),
        rchar=pad_rows(BASE_ENC[batch.rchar], Rb, np.int32, drop=1),
        rslen=pad_rows(batch.rslen[:, None], 1, np.int32),
        haplen=np.maximum(pad_rows(batch.haplen[:, None], 1, np.int32), 1),
        pmm_u=pad_rows(batch.p_mm, Rb, np.float32, drop=2),
        pgapm_u=pad_rows(batch.p_gapm, Rb, np.float32, drop=2),
        pmx_u=pad_rows(batch.p_mx, Rb, np.float32, drop=2),
        pzz_u=pad_rows(batch.p_zz, Rb, np.float32, drop=2),
        p_my=pad_rows(batch.p_my, Rb, np.float32, drop=1),
        p_zz=pad_rows(batch.p_zz, Rb, np.float32, drop=1),
        dm=pad_rows(batch.distm_match, Rb, np.float32, drop=1),
        dmm=pad_rows(batch.distm_mis, Rb, np.float32, drop=1),
        u0=pad_rows(u0[:, None], 1, np.float32),
    )
    return args


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "stream",
                                    "stream_carry"))
def _product_forward(read_planes, rchar, rslen, pgapm1,
                     hap_planes, haplen, y_init,
                     ridx, hidx, *, band: int, interpret: bool = False,
                     stream: bool = False, stream_carry: bool = False):
    """Device-side product expansion + banded forward.

    Per-read transition/emission planes ((Rb, n_reads) f32/int32) and
    per-hap planes ((HR, n_haps) int32) are gathered along lanes into the
    (rows, n_pairs) layout the kernel wants — the data shipped to the
    device is per-read/per-hap (the reference's own precompute grain,
    compute_prob_scalar.cc:74-86), not per-pair.
    """
    rp = [p[:, ridx] for p in read_planes]
    rc = rchar[:, ridx]
    rl = rslen[:, ridx]
    hp = hap_planes[:, hidx]
    hl = haplen[:, hidx]
    yi = y_init[:, hidx]
    u0 = yi * pgapm1[:, ridx]
    return pairhmm_pallas_banded(
        hp, rc, rl, hl, rp[0], rp[1], rp[2], rp[3], rp[4], rp[5],
        rp[6], rp[7], u0, band=band, interpret=interpret, stream=stream,
        stream_carry=stream_carry)


def pack_reads_for_product(reads: list[dict], band: int = 32,
                           pad_rdlen: int = 0):
    """Per-read banded planes (vectorized; reads padded to the batch max).

    Returns (read_planes tuple of 8 (Rb, n) f32 in kernel order
    [pmm_u, pgapm_u, pmx_u, pzz_u, p_my, p_zz, dm, dmm], rchar (Rb, n)
    int32 one-hot, rslen (1, n), pgapm1 (1, n) f32)."""
    from mgl_tpu.core.context import CTX_F32, read_transition_rows

    n = len(reads)
    rmax = max(len(r["bases"]) for r in reads)
    Rb = _round_up(max(rmax, pad_rdlen), band)

    def tracks(key):
        out = np.zeros((n, rmax), np.uint8)
        for k, r in enumerate(reads):
            out[k, : len(r[key])] = r[key]
        return out

    q, i, d, c = tracks("q"), tracks("i"), tracks("d"), tracks("c")
    p_mm, p_gapm, p_mx, p_my, p_zz, distm = read_transition_rows(
        q, i, d, c, CTX_F32)                     # (n, rmax+1) rows 0..rmax
    # zero transition rows past each read's length (pad invariance)
    rslen = np.array([len(r["bases"]) for r in reads], np.int32)
    col = np.arange(rmax + 1)[None, :]
    live = col <= rslen[:, None]
    dm = ((np.float32(1.0) - distm) * live).astype(np.float32)
    dmm = (distm * (np.float32(1.0) / np.float32(3.0)) * live).astype(
        np.float32)
    p_mm, p_gapm, p_mx, p_my, p_zz = (
        (a * live).astype(np.float32)
        for a in (p_mm, p_gapm, p_mx, p_my, p_zz))

    def dev(a, drop):
        out = np.zeros((Rb, n), np.float32)
        src = a.T[drop:]
        out[: src.shape[0]] = src
        return out

    planes = (dev(p_mm, 2), dev(p_gapm, 2), dev(p_mx, 2), dev(p_zz, 2),
              dev(p_my, 1), dev(p_zz, 1), dev(dm, 1), dev(dmm, 1))
    bases = np.zeros((n, rmax), np.uint8)
    for k, r in enumerate(reads):
        bases[k, : len(r["bases"])] = r["bases"]
    rchar = np.zeros((Rb, n), np.int32)
    rchar[:rmax] = BASE_ENC[bases].T
    pgapm1 = p_gapm[:, 1][None, :].astype(np.float32)
    return planes, rchar, rslen[None, :], pgapm1


_DEV_TABLES: dict = {}


def _ctx_tables_f32():
    """Device-resident CTX_F32 tables (ph2pr, match_to_match, BASE_ENC)
    for on-device plane construction."""
    if "f32" not in _DEV_TABLES:
        import jax.numpy as jnp

        from mgl_tpu.core.context import CTX_F32

        _DEV_TABLES["f32"] = (
            jnp.asarray(np.asarray(CTX_F32.ph2pr, np.float32)),
            jnp.asarray(np.asarray(CTX_F32.match_to_match, np.float32)),
            jnp.asarray(BASE_ENC.astype(np.int32)),
        )
    return _DEV_TABLES["f32"]


def _read_planes_device(q, i, d, c, bases, rslen, ph2pr, m2m, enc,
                        *, Rb: int, Bp: int):
    """Device-side re-derivation of pack_reads_for_product (+
    core.context.read_transition_rows): the host ships only the four raw
    quality tracks and bases (5 bytes/base) instead of 8 f32 planes
    (32 bytes/base); the table gathers and row shifts run on device.
    Bit-identical to the host packer (same f32 table values and op
    order).  Inputs (n, rmax) uint8; returns kernel-order planes
    ((Rb, Bp) x8 f32), rchar (Rb, Bp) i32, rslen (1, Bp) i32,
    pgapm1 (1, Bp) f32."""
    import jax.numpy as jnp

    n, rmax = q.shape
    qi = (q & np.uint8(127)).astype(jnp.int32)
    ii = (i & np.uint8(127)).astype(jnp.int32)
    di = (d & np.uint8(127)).astype(jnp.int32)
    ci = (c & np.uint8(127)).astype(jnp.int32)
    mn = jnp.minimum(ii, di)
    mx = jnp.maximum(ii, di)
    p_mm = m2m[((mx * (mx + 1)) >> 1) + mn]
    p_gapm = jnp.float32(1.0) - ph2pr[ci]
    p_mx = ph2pr[ii]
    p_my = ph2pr[di]
    p_zz = ph2pr[ci]
    distm = ph2pr[qi]

    z1 = jnp.zeros((n, 1), jnp.float32)
    zrow = lambda a: jnp.concatenate([z1, a], axis=1)   # leading zero row
    col = jnp.arange(rmax + 1, dtype=jnp.int32)[None, :]
    live = col <= rslen[:, None].astype(jnp.int32)
    lrow = lambda a: jnp.where(live, zrow(a), 0.0)
    dm = jnp.where(live, jnp.float32(1.0) - zrow(distm), 0.0)
    dmm = jnp.where(live, zrow(distm) * np.float32(1.0 / 3.0), 0.0)
    p_mm_r, p_gapm_r = lrow(p_mm), lrow(p_gapm)
    p_mx_r, p_my_r, p_zz_r = lrow(p_mx), lrow(p_my), lrow(p_zz)

    def dev(a, drop):
        src = a.T[drop:]
        return jnp.zeros((Rb, Bp), jnp.float32).at[
            : rmax + 1 - drop, :n].set(src)

    planes = (dev(p_mm_r, 2), dev(p_gapm_r, 2), dev(p_mx_r, 2),
              dev(p_zz_r, 2), dev(p_my_r, 1), dev(p_zz_r, 1),
              dev(dm, 1), dev(dmm, 1))
    rchar = jnp.zeros((Rb, Bp), jnp.int32).at[:rmax, :n].set(
        enc[bases.astype(jnp.int32)].T)
    rsl = jnp.zeros((1, Bp), jnp.int32).at[0, :n].set(
        rslen.astype(jnp.int32))
    pgapm1 = jnp.zeros((1, Bp), jnp.float32).at[0, :n].set(p_gapm_r[:, 1])
    return planes, rchar, rsl, pgapm1


def _stack_tracks(reads: list[dict]):
    """(n, rmax) uint8 track matrices (q, i, d, c, bases) + rslen."""
    n = len(reads)
    lens = np.array([len(r["bases"]) for r in reads], np.int32)
    rmax = int(lens.max()) if n else 0
    if (lens == rmax).all():
        mats = tuple(np.stack([np.asarray(r[k], np.uint8) for r in reads])
                     for k in ("q", "i", "d", "c", "bases"))
        return mats + (lens,)
    out = [np.zeros((n, rmax), np.uint8) for _ in range(5)]
    for k, r in enumerate(reads):
        for j, key in enumerate(("q", "i", "d", "c", "bases")):
            out[j][k, : lens[k]] = r[key]
    return (*out, lens)


@functools.partial(jax.jit, static_argnames=("Rb", "Bp", "scp", "band",
                                             "interpret"))
def _shared_forward_tracks(hstream, segtab, q, i, d, c, bases, rslen,
                           y_shared, ph2pr, m2m, enc,
                           *, Rb, Bp, scp, band, interpret):
    """Shared-hap-set forward with on-device plane construction."""
    planes, rchar, rsl, pgapm1 = _read_planes_device(
        q, i, d, c, bases, rslen, ph2pr, m2m, enc, Rb=Rb, Bp=Bp)
    u0 = y_shared * pgapm1
    return pairhmm_pallas_shared(hstream, rchar, rsl, segtab, *planes, u0,
                                 scp=scp, band=band, interpret=interpret)


def pack_haps_for_product(haps: list[np.ndarray], band: int = 32):
    """Per-hap planes: (hap_planes (HR, n) int32 one-hot, haplen (1, n),
    y_init (1, n) f32)."""
    from mgl_tpu.core.context import CTX_F32

    n = len(haps)
    hmax = max(len(h) for h in haps)
    HR = hmax + band
    hp = np.zeros((HR, n), np.int32)
    haplen = np.zeros((1, n), np.int32)
    for k, h in enumerate(haps):
        hp[: len(h), k] = BASE_ENC[np.asarray(h)]
        haplen[0, k] = len(h)
    y_init = (np.float32(CTX_F32.initial_constant)
              / haplen.astype(np.float32))
    return hp, haplen, y_init


@functools.partial(jax.jit,
                   static_argnames=("Rb", "band", "interpret", "stream",
                                    "stream_carry"))
def _product_forward_tracks(q, i, d, c, bases, rlens,
                            hp, haplen, y_init, ridx, hidx,
                            ph2pr, m2m, enc, *, Rb, band, interpret,
                            stream, stream_carry):
    """Product expansion with on-device plane construction from raw
    quality tracks (see _read_planes_device)."""
    planes, rchar, rsl, pgapm1 = _read_planes_device(
        q, i, d, c, bases, rlens, ph2pr, m2m, enc, Rb=Rb, Bp=q.shape[0])
    return _product_forward(
        planes, rchar, rsl, pgapm1, hp, haplen, y_init, ridx, hidx,
        band=band, interpret=interpret, stream=stream,
        stream_carry=stream_carry)


def forward_scores_product(reads: list[dict], haps: list[np.ndarray],
                           pair_index: list[tuple[int, int]],
                           band: int = 32,
                           stream: bool = False,
                           stream_carry: bool = False) -> np.ndarray:
    """(B,) f32 scaled scores for arbitrary (read, hap) pairs with
    device-side product expansion (raw tracks ship; planes build on
    device)."""
    import jax.numpy as jnp

    B = len(pair_index)
    Bp = _round_up(max(B, 1), LANES)
    q, i, d, c, bases, rlens = _stack_tracks(reads)
    Rb = _round_up(int(rlens.max()), band)
    hp, haplen, y_init = pack_haps_for_product(haps, band)
    # the hap plane must cover Rb's ramp: HR >= hmax + band already
    pi = np.asarray(pair_index, np.int64).reshape(-1, 2)
    ridx = np.zeros(Bp, np.int64)
    hidx = np.zeros(Bp, np.int64)
    ridx[:B], hidx[:B] = pi[:, 0], pi[:, 1]
    # pad lanes replicate pair 0 (harmless, ignored on output)
    ph2pr, m2m, enc = _ctx_tables_f32()
    score = _product_forward_tracks(
        jnp.asarray(q), jnp.asarray(i), jnp.asarray(d), jnp.asarray(c),
        jnp.asarray(bases), jnp.asarray(rlens),
        jnp.asarray(hp), jnp.asarray(np.maximum(haplen, 1)),
        jnp.asarray(y_init),
        jnp.asarray(ridx), jnp.asarray(hidx), ph2pr, m2m, enc, Rb=Rb,
        band=band,
        interpret=env_interpret(), stream=stream, stream_carry=stream_carry)
    return np.asarray(score)[0, :B]


def forward_scores_banded(batch, band: int = 32) -> np.ndarray:
    """Host convenience: PairHMMBatch -> (B,) f32 scaled scores (banded)."""
    import jax.numpy as jnp

    B = batch.rchar.shape[0]
    a = prepare_inputs_banded(batch, band=band)
    keys = ("hap", "rchar", "rslen", "haplen", "pmm_u", "pgapm_u", "pmx_u",
            "pzz_u", "p_my", "p_zz", "dm", "dmm", "u0")
    score = pairhmm_pallas_banded(
        *(jnp.asarray(a[k]) for k in keys), band=band,
        interpret=env_interpret())
    return np.asarray(score)[0, :B]


def prepare_inputs(batch):
    """Transpose a PairHMMBatch (ops/pairhmm.py) into lane-major padded
    arrays for pairhmm_pallas_forward.

    Boundary-free layout invariants (see kernel docstring):
      * R1p >= rmax + 2 so the bottom row is zero for every lane;
      * transition row 0 is (p_mm,p_gapm,p_mx,p_my,p_zz) = (0,0,0,0,1)
        and emission row 0 is 0;
      * bases one-hot encoded so pads (0) never match.
    """
    B, R = batch.rchar.shape
    H = batch.hap.shape[1]
    Bp = _round_up(max(B, 1), LANES)
    R1p = _round_up(R + 1, 8)
    HP = _round_up(R1p + H + 1, 8)

    def pad_rows(a, rows, dtype):
        out = np.zeros((rows, Bp), dtype)
        out[: a.shape[1], :B] = a.T
        return out

    hpad = pad_rows(BASE_ENC[batch.hap], HP, np.int32)
    rchar = pad_rows(BASE_ENC[batch.rchar], R1p, np.int32)

    p_mm = pad_rows(batch.p_mm, R1p, np.float32)
    p_gapm = pad_rows(batch.p_gapm, R1p, np.float32)
    p_mx = pad_rows(batch.p_mx, R1p, np.float32)
    p_my = pad_rows(batch.p_my, R1p, np.float32)
    p_zz = pad_rows(batch.p_zz, R1p, np.float32)
    dm = pad_rows(batch.distm_match, R1p, np.float32)
    dmm = pad_rows(batch.distm_mis, R1p, np.float32)
    for a in (p_mm, p_gapm, p_mx, p_my, dm, dmm):
        a[0, :] = 0.0
    p_zz[0, :] = 1.0

    args = dict(
        hpad=hpad,
        rchar=rchar,
        rslen=pad_rows(batch.rslen[:, None], 1, np.int32),
        haplen=np.maximum(pad_rows(batch.haplen[:, None], 1, np.int32), 1),
        p_mm=p_mm, p_gapm=p_gapm, p_mx=p_mx, p_my=p_my, p_zz=p_zz,
        dm=dm, dmm=dmm,
        y_init=pad_rows(batch.y_init[:, None], 1, np.float32),
    )
    return args


def forward_scores(batch) -> np.ndarray:
    """Host convenience: PairHMMBatch -> (B,) f32 scaled scores.

    Uses the banded kernel (the fastest path); forward_scores_plane keeps
    the full-height wavefront variant callable for comparison.
    """
    return forward_scores_banded(batch)


def forward_scores_plane(batch) -> np.ndarray:
    """PairHMMBatch -> (B,) f32 scores via the full-height plane kernel."""
    import jax.numpy as jnp

    B = batch.rchar.shape[0]
    args = prepare_inputs(batch)
    score = pairhmm_pallas_forward(
        jnp.asarray(args["hpad"]), jnp.asarray(args["rchar"]),
        jnp.asarray(args["rslen"]), jnp.asarray(args["haplen"]),
        jnp.asarray(args["p_mm"]), jnp.asarray(args["p_gapm"]),
        jnp.asarray(args["p_mx"]), jnp.asarray(args["p_my"]),
        jnp.asarray(args["p_zz"]), jnp.asarray(args["dm"]),
        jnp.asarray(args["dmm"]), jnp.asarray(args["y_init"]),
        interpret=env_interpret(),
    )
    return np.asarray(score)[0, :B]

"""Pallas TPU kernels for batched Smith-Waterman.

Device implementations of ops/sw.py with identical semantics (same
recurrences, tie rules, and boundary handling as sw.cpp:5-146 — ops/sw.py
is the executable specification):

* `_sw_banded_kernel` / `sw_pallas_banded` — the performance path:
  32-row staggered bands (sublane s of band b = matrix row b*BH+s+1 at
  column t-s+1), SW's vertical-gap stream pre-combined as
  A = max(H-open, E-ext) with its extend bit packed in the LSB, one
  (A, H) row per column crossing bands through a double-buffered VMEM
  carry.  Supports full traceback (band-major nibble words DMA'd to HBM,
  decoded by the native banded decoder) and a score-only mode, both with
  on-device ScoreMax under the reference's exact tie rules.
* `_sw_kernel` / `sw_pallas_forward` — the original full-height plane
  wavefront (kept as a second implementation and cross-check: one
  anti-diagonal of all R1p rows per step).
* `_sw_score_kernel` / `sw_pallas_scores` — plane score-only variant.

All kernels put 128 pairs in the VPU lanes (inter-pair vectorization; the
reference's AVX lanes instead span one pair's anti-diagonal) and run the
wavefront loop inside the kernel so DP state never touches HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgl_tpu.core.params import DP_NEG_INF

LANES = 128
NEG = np.int32(DP_NEG_INF)


from mgl_tpu.utils import round_up as _round_up  # shared helper
from mgl_tpu.kernels.pairhmm_pallas import _imode, env_interpret


def _sw_kernel(
    *refs,
    R1p: int, D: int, indel_init: bool, with_traceback: bool,
):
    (mt_ref, mm_ref, go_ref, ge_ref, dmin_ref,
     tchar_ref, qpad_ref, tlen_ref, qlen_ref) = refs[:9]
    if with_traceback:
        ez_ref, btr_ref = refs[9:11]
        (sc_buf, e_ref, f_ref, qd_ref,
         pack_ref, dma_sem) = refs[11:]
    else:
        lc_ref, lr_ref = refs[9:11]
        btr_ref = None
        sc_buf, e_ref, f_ref, qd_ref = refs[11:]
        pack_ref = dma_sem = None
    w_match = mt_ref[0, 0]
    w_mismatch = mm_ref[0, 0]
    w_open = go_ref[0, 0]
    w_ext = ge_ref[0, 0]

    row = jax.lax.broadcasted_iota(jnp.int32, (R1p, LANES), 0)
    tchar = tchar_ref[:]
    tlen_row = tlen_ref[0:1, :]
    qlen_row = qlen_ref[0:1, :]
    mask_lr = row == tlen_row
    neg = jnp.full((R1p, LANES), NEG, jnp.int32)

    def border(k):
        # first-row/column init (sw.cpp:29-40); k is a traced scalar
        if indel_init:
            return jnp.where(k >= 1, -w_open - (k - 1) * w_ext, 0)
        return jnp.int32(0)

    # diag 0 -> sc_buf slot 0; diag 1 -> slot 1
    sc_buf[0:1] = jnp.where(row == 0, 0, neg)[None]
    b1 = border(jnp.int32(1))
    sc_buf[1:2] = jnp.where(row <= 1, b1, neg)[None]
    e_ref[:] = neg
    f_ref[:] = neg
    qd_ref[:] = jnp.where(row == 0, qpad_ref[0:1, :], 0)
    if with_traceback:
        pack_ref[:] = jnp.zeros((2, R1p, LANES), jnp.uint32)

    def body(d, ez_carry, *, sample: bool = True):
        sc_prev = sc_buf[pl.ds((d - 1) % 2, 1)][0]
        sc_prev2 = sc_buf[pl.ds(d % 2, 1)][0]

        qrow = qpad_ref[pl.ds(d - 1, 1), :]
        qdiag = jnp.where(row == 0, qrow, pltpu.roll(qd_ref[:], 1, 0))
        qd_ref[:] = qdiag

        # E (vertical / DEL): from element r-1 of diag d-1
        sc_up = pltpu.roll(sc_prev, 1, 0)
        e_up = pltpu.roll(e_ref[:], 1, 0)
        open_v = sc_up - w_open
        ext_v = e_up - w_ext
        open_wins_v = open_v > ext_v               # strict > (sw.cpp:73)
        e_cur = jnp.where(open_wins_v, open_v, ext_v)

        # F (horizontal / INS): from element r of diag d-1
        open_h = sc_prev - w_open
        ext_h = f_ref[:] - w_ext
        open_wins_h = open_h > ext_h               # strict > (sw.cpp:84)
        f_cur = jnp.where(open_wins_h, open_h, ext_h)

        sub = jnp.where(qdiag == tchar, w_match, w_mismatch)
        diag_sc = pltpu.roll(sc_prev2, 1, 0) + sub

        is_diag = (diag_sc >= e_cur) & (diag_sc >= f_cur)
        ins_over_del = f_cur >= e_cur
        sc_cur = jnp.where(is_diag, diag_sc,
                           jnp.where(ins_over_del, f_cur, e_cur))

        bval = border(d)
        boundary = (row == 0) | (row == d)
        sc_cur = jnp.where(boundary, bval, sc_cur)
        e_cur = jnp.where(boundary, NEG, e_cur)
        f_cur = jnp.where(boundary, NEG, f_cur)

        sc_buf[pl.ds(d % 2, 1)] = sc_cur[None]
        e_ref[:] = e_cur
        f_ref[:] = f_cur

        # ScoreMax sampling: select-and-reduce instead of cross-sublane gather
        if sample:
            lc_mask = row == (d - qlen_row)
            lc_val = jnp.sum(jnp.where(lc_mask, sc_cur, 0), axis=0,
                             keepdims=True)
            lr_val = jnp.sum(jnp.where(mask_lr, sc_cur, 0), axis=0,
                             keepdims=True)
        if with_traceback and sample:
            # on-device ScoreMax with the reference's exact tie rules.
            # Last column (i = d - qlen ascending): '>=' so the largest i
            # wins ties (sw.cpp:100-104).  Last row (j = d - tlen
            # ascending): '>' or equal-and-closer-to-diagonal; among equal
            # candidates that is argmax of (value, -|tlen-j|, earliest), a
            # history-free selection, so a running reduction is exact
            # (sw.cpp:115-127); the merge with mqe happens after the loop.
            mqe, mqe_t, rmax, rdist, rj = ez_carry[:5]
            i_lc = d - qlen_row
            lc_ok = (i_lc >= 1) & (i_lc <= tlen_row)
            take = lc_ok & (lc_val >= mqe)
            mqe = jnp.where(take, lc_val, mqe)
            mqe_t = jnp.where(take, i_lc, mqe_t)
            j_lr = d - tlen_row
            lr_ok = (j_lr >= 1) & (j_lr <= qlen_row)
            dist = jnp.abs(tlen_row - j_lr)
            rtake = lr_ok & ((lr_val > rmax) | ((lr_val == rmax) & (dist < rdist)))
            rmax = jnp.where(rtake, lr_val, rmax)
            rdist = jnp.where(rtake, dist, rdist)
            rj = jnp.where(rtake, j_lr, rj)
            ez_carry = (mqe, mqe_t, rmax, rdist, rj) + tuple(ez_carry[5:])
        elif not with_traceback:
            lc_ref[pl.ds(d - 2, 1), :] = lc_val
            lr_ref[pl.ds(d - 2, 1), :] = lr_val

        if with_traceback:
            # 4-bit nibble: bits0-1 move (0 diag, 1 INS, 2 DEL),
            # bit2 E-extend, bit3 F-extend
            word_acc = ez_carry[-1]
            move = jnp.where(is_diag, 0, jnp.where(ins_over_del, 1, 2))
            nib = (move
                   | jnp.where(open_wins_v, 0, 4)
                   | jnp.where(open_wins_h, 0, 8))
            nib = jnp.where(boundary, 0, nib).astype(jnp.uint32)
            tile = pl.program_id(0)
            w = (d - 2) // 8
            slot = w % 2
            phase = (d - 2) % 8

            def _dma(word_idx, slot_idx):
                return pltpu.make_async_copy(
                    pack_ref.at[pl.ds(slot_idx, 1)],
                    btr_ref.at[pl.ds(word_idx, 1), :,
                               pl.ds(tile * LANES, LANES)],
                    dma_sem.at[slot_idx],
                )

            # accumulate in registers: fresh word at phase 0, OR-in after
            word_acc = jnp.where(phase == 0, nib,
                                 word_acc | (nib << (phase * 4).astype(jnp.uint32)))

            # word end: reclaim the slot (its word-w-2 DMA), store the
            # completed word, kick the flush asynchronously
            flush = (phase == 7) | (d == D - 1)

            @pl.when(flush & (w >= 2))
            def _reuse():
                _dma(w - 2, slot).wait()

            @pl.when(flush)
            def _flush():
                pack_ref[pl.ds(slot, 1)] = word_acc[None]
                _dma(w, slot).start()

            ez_carry = ez_carry[:5] + (word_acc,)

        return ez_carry

    one = jnp.ones((1, LANES), jnp.int32)
    ez0 = (jnp.full((1, LANES), NEG, jnp.int32), one,
           jnp.full((1, LANES), NEG, jnp.int32),
           jnp.full((1, LANES), 0x3FFFFFFF, jnp.int32), one)
    if with_traceback:
        ez0 = (*ez0, jnp.zeros((R1p, LANES), jnp.uint32))
        # diagonals below dmin = min(tlen, qlen) + 1 have no last-row or
        # last-column cell in any lane of this tile: skip the sampling ops
        dmin = jnp.clip(dmin_ref[0, pl.program_id(0)], 2, D)
        ez_mid = jax.lax.fori_loop(
            2, dmin, functools.partial(body, sample=False), ez0)
        ez_fin = jax.lax.fori_loop(dmin, D, body, ez_mid)
    else:
        ez_fin = jax.lax.fori_loop(2, D, body, ez0)

    if with_traceback:
        # merge the last-row winner against mqe (the reference initializes
        # its last-row scan with (mqe, mqe_t, qlen), sw.cpp:115-116)
        mqe, mqe_t, rmax, rdist, rj = ez_fin[:5]
        mqe_dist = jnp.abs(mqe_t - qlen_row)
        row_wins = (rmax > mqe) | ((rmax == mqe) & (rdist < mqe_dist))
        ez_ref[0:1] = mqe
        ez_ref[1:2] = mqe_t
        ez_ref[2:3] = jnp.where(row_wins, rmax, mqe)
        ez_ref[3:4] = jnp.where(row_wins, tlen_row, mqe_t)
        ez_ref[4:5] = jnp.where(row_wins, rj, qlen_row)
        ez_ref[5:6] = jnp.where(row_wins, qlen_row - rj, 0)

        # drain the last (and possibly second-to-last) in-flight flushes
        tile = pl.program_id(0)
        n_w = (D - 2 + 7) // 8

        def _dma_static(word_idx):
            return pltpu.make_async_copy(
                pack_ref.at[pl.ds(word_idx % 2, 1)],
                btr_ref.at[pl.ds(word_idx, 1), :,
                           pl.ds(tile * LANES, LANES)],
                dma_sem.at[word_idx % 2],
            )

        _dma_static(n_w - 1).wait()
        if n_w >= 2:
            _dma_static(n_w - 2).wait()


_SW_BANDED_SEGMENTS = True


def _sw_banded_kernel(
    *refs,
    BH: int, NB: int, NT: int, Qcp: int, QR: int, WPB: int,
    indel_init: bool, with_traceback: bool = True, stream: bool = False,
    stream_carry: bool = False, CW: int = 256,
):
    """Banded staggered-wavefront SW with traceback + on-device ScoreMax.

    Same banding as the PairHMM kernel (sublane s of band b = matrix row
    b*BH+s+1, at column c = t-s+1 on step t) with SW's pre-combined
    vertical-gap stream:
        A(r,c)    = max(H(r,c) - open, E(r,c) - ext)
        ebit(r,c) = 0 if H-open > E-ext else 4      (the E-extend nibble bit)
    so the consumer's E(r,c) is just the injected roll of A(r-1,c).  One
    (A, ebit, H) row per column crosses bands through the double-buffered
    carry (A and ebit for E; H for the diagonal move).  Traceback nibbles
    pack band-major: global word b*WPB + t//8, sublane s, nibble t%8;
    pre-wavefront positions (t < s) are never read by the decoder.
    """
    (mt_ref, mm_ref, go_ref, ge_ref, tlo_ref, thi_ref,
     tchar_ref, qpad_ref, tlen_ref, qlen_ref) = refs[:10]
    rest = list(refs[10:])
    if stream_carry:
        # long-query mode: the inter-band carry planes and the query
        # plane live in HBM; CW-column windows stream through
        # double-buffered VMEM (same band-DMA technique as `stream`,
        # applied to the carry dimension — the reference's O(band x COLS)
        # state, sw_avx.cpp:37-49, with COLS itself windowed)
        cr_win, cw_win, qp_win, cr_sem, cw_sem, qp_sem = rest[-6:]
        rest = rest[:-6]
    if with_traceback:
        # outs: ez, btr; scratch: carry (2,2,Qcp,L): packed A / H
        ez_ref, btr_ref, carry_ref, pack_sl, dma_sem = rest[:5]
        rest = rest[5:]
    else:
        ez_ref, carry_ref = rest[:2]
        rest = rest[2:]
        btr_ref = pack_sl = dma_sem = None
    if stream:
        # long-target mode: tchar lives in HBM; band slices stream into a
        # double-buffered VMEM scratch (the reference's band streaming,
        # sw_avx.cpp:37-49, re-expressed as async DMA)
        tch_buf, tch_sem = rest

        def _tch_dma(b, slot):
            tile0 = pl.program_id(0) * LANES
            return pltpu.make_async_copy(
                tchar_ref.at[pl.ds(b * BH, BH), pl.ds(tile0, LANES)],
                tch_buf.at[slot],
                tch_sem.at[slot],
            )

        _tch_dma(0, 0).start()
    else:
        tch_buf = tch_sem = None
    w_match = mt_ref[0, 0]
    w_mismatch = mm_ref[0, 0]
    w_open = go_ref[0, 0]
    w_ext = ge_ref[0, 0]
    tile = pl.program_id(0)

    row = jax.lax.broadcasted_iota(jnp.int32, (BH, LANES), 0)
    row0 = row == 0
    tlen_row = tlen_ref[0:1, :]
    qlen_row = qlen_ref[0:1, :]
    TRASH = Qcp - 1

    if stream_carry:
        Qcph = carry_ref.shape[2]
        n_ck = Qcph // CW
        kr_max = (NT + 1) // CW          # last carry chunk any read touches
        kq_max = NT // CW                # last qpad chunk any read touches
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

        def _qp_dma(k):
            return pltpu.make_async_copy(
                qpad_ref.at[pl.ds(k * CW, CW), pl.ds(tile * LANES, LANES)],
                qp_win.at[k % 2],
                qp_sem.at[k % 2],
            )

        # pre-fill HBM carry buffer 0 with the row-0 boundary planes
        # (H(0, c) per sw.cpp:29-40; A with its extend bit in the LSB) so
        # the band loop is uniform — band 0 reads them like any carry-in
        ci = jax.lax.broadcasted_iota(jnp.int32, (CW, LANES), 0)

        def _init_ck(k, _):
            c = ci + k * CW
            if indel_init:
                bcv = jnp.where(c >= 1, -w_open - (c - 1) * w_ext, 0)
            else:
                bcv = c * 0
            a0v = ((bcv - w_open) << 1) if with_traceback else (bcv - w_open)
            cw_win[0:1, 0:1, pl.ds(0, CW)] = a0v[None, None]
            cw_win[0:1, 1:2, pl.ds(0, CW)] = bcv[None, None]
            cp = _cw_dma(k, 0, 0)
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, n_ck, _init_ck, 0)
        # buffer 1 is left uninitialized: band 0 writes every column a
        # later band ever reads live values from (columns past the last
        # write feed only cells beyond qlen, which sampling masks out)
    else:
        def border_cols():
            # H(0, c) for all carry columns c (row-0 boundary, sw.cpp:29-40)
            c = jax.lax.broadcasted_iota(jnp.int32, (Qcp, LANES), 0)
            if indel_init:
                return jnp.where(c >= 1, -w_open - (c - 1) * w_ext, 0)
            return c * 0

        bc = border_cols()
        # A rides with its extend bit packed in the LSB (scores are far from
        # +-2^30, so the shift is lossless); bit 0 = open-wins at row 0
        a0 = ((bc - w_open) << 1) if with_traceback else (bc - w_open)
        carry_ref[0:1, 0:1] = a0[None, None]               # A(0, c)
        carry_ref[0:1, 1:2] = bc[None, None]               # H(0, c)
        carry_ref[1:2] = jnp.zeros((1, 2, Qcp, LANES), jnp.int32)

    def band(b, sm_carry):
        rd = b % 2
        wr = (b + 1) % 2
        if stream:
            _tch_dma(b, rd).wait()

            @pl.when(b + 1 < NB)
            def _prefetch():
                _tch_dma(b + 1, wr).start()

            tch = tch_buf[pl.ds(rd, 1)][0]
        else:
            tch = tchar_ref[pl.ds(b * BH, BH)]
        if stream_carry:
            # per-band window resets: carry reads restart at column 1 and
            # qpad reads at row 0 every band
            _cr_dma(0, rd).start()
            if kr_max >= 1:
                _cr_dma(1, rd).start()
            _qp_dma(0).start()
            if kq_max >= 1:
                _qp_dma(1).start()
            _cr_dma(0, rd).wait()
            _qp_dma(0).wait()
        row_abs = row + b * BH + 1
        zero = jnp.minimum(tch, 0)       # data-dependent zero (layout anchor)
        if indel_init:
            border_rows = -w_open - (row_abs - 1) * w_ext + zero  # H(r, 0)
        else:
            border_rows = zero
        mask_last = row_abs == tlen_row
        s_star = tlen_row - 1 - b * BH          # tlen's sublane in this band
        in_band_lr = (s_star >= 0) & (s_star < BH)

        def cread(plane, idx):
            if stream_carry:
                return cr_win[pl.ds((idx // CW) % 2, 1), pl.ds(plane, 1),
                              pl.ds(idx % CW, 1)][0, 0]
            return carry_ref[pl.ds(rd, 1), pl.ds(plane, 1),
                             pl.ds(idx, 1)][0, 0]

        h_un = border_rows                 # column-0 state
        f_un = zero + NEG
        br_up = pltpu.roll(h_un, 1, 0)     # border(r-1) per sublane
        # H(r0-1, 0): column-0 boundary of the row above the band (col 0 is
        # never carried, so compute it: border(b*BH), with border(0) = 0)
        if indel_init:
            h00 = jnp.where(b == 0, 0, -w_open - (b * BH - 1) * w_ext)
        else:
            h00 = jnp.int32(0)
        a_fill = (h_un - w_open) << 1 if with_traceback else h_un - w_open
        a_p = jnp.where(row0, cread(0, 1), a_fill)
        h_sh_p = jnp.where(row0, cread(1, 1), br_up)
        h_sh_pp = jnp.where(row0, zero + h00, br_up)
        if stream_carry:
            qd = jnp.where(row0, qp_win[pl.ds(0, 1), 0:1, :][0], zero)
        else:
            qd = jnp.where(row0, qpad_ref[0:1, :], zero)
        word0 = zero.astype(jnp.uint32)

        def step(t, carry, *, sample: bool, ramp: bool):
            (h_un, f_un, a_p, h_sh_p, h_sh_pp, qd, word_acc,
             mqe, mqe_t, rmax, rdist, rj) = carry

            # E(r,c) = A(r-1,c); in traceback mode A carries its extend bit
            e_cur = (a_p >> 1) if with_traceback else a_p
            open_h = h_un - w_open
            ext_h = f_un - w_ext
            if with_traceback:
                open_wins_h = open_h > ext_h            # strict > (sw.cpp:84)
                f_cur = jnp.where(open_wins_h, open_h, ext_h)
            else:
                f_cur = jnp.maximum(open_h, ext_h)

            sub = jnp.where(qd == tch, w_match, w_mismatch)
            diag_sc = h_sh_pp + sub
            if with_traceback:
                # value-identical restatement of the select chain
                # (priority diag >= INS >= DEL, sw.cpp:60-71): the H value
                # is a plain max either way; only the BITS need the
                # compares — and is_diag vs BOTH e and f collapses to one
                # compare against their max.  2 fewer vreg ops/step on
                # the traceback path (issue-bound, DESIGN.md §5).
                ef_max = jnp.maximum(e_cur, f_cur)
                is_diag = diag_sc >= ef_max
                ins_over_del = f_cur >= e_cur
                h_cur = jnp.maximum(diag_sc, ef_max)
            else:
                h_cur = jnp.maximum(diag_sc, jnp.maximum(e_cur, f_cur))

            # A production for the row below (already carries its bit)
            open_v = h_cur - w_open
            ext_v = e_cur - w_ext
            if with_traceback:
                open_wins_v = open_v > ext_v            # strict > (sw.cpp:73)
                a_cur = (jnp.where(open_wins_v, open_v, ext_v) << 1
                         | jnp.where(open_wins_v, 0, 1))
                # nibble: move | ebit | fbit (pre-wavefront cells unread)
                nib = (jnp.where(is_diag, 0, jnp.where(ins_over_del, 1, 2))
                       | ((a_p & 1) << 2)
                       | jnp.where(open_wins_h, 0, 8)).astype(jnp.uint32)
            else:
                a_cur = jnp.maximum(open_v, ext_v)

            if ramp:
                # pre-wavefront cells (c <= 0) must hold the column-0
                # boundary so the wavefront reads it on activation
                pre = (row + zero) > t
                h_cur = jnp.where(pre, border_rows, h_cur)
                f_cur = jnp.where(pre, NEG + zero, f_cur)
                a_fill = ((border_rows - w_open) << 1 if with_traceback
                          else border_rows - w_open)
                a_cur = jnp.where(pre, a_fill, a_cur)

            if sample:
                # last column (i ascending over t: '>=' rule); the sampled
                # sublane must live in THIS band or the empty-masked sum
                # would inject a spurious 0
                s_lc = t + 1 - qlen_row
                lc_mask = row == s_lc
                lc_val = jnp.sum(jnp.where(lc_mask, h_cur, 0), axis=0,
                                 keepdims=True)
                i_lc = t + 2 + b * BH - qlen_row
                lc_ok = ((s_lc >= 0) & (s_lc < BH)
                         & (i_lc >= 1) & (i_lc <= tlen_row))
                take = lc_ok & (lc_val >= mqe)
                mqe = jnp.where(take, lc_val, mqe)
                mqe_t = jnp.where(take, i_lc, mqe_t)
                # last row (j ascending: '>' or equal-and-closer rule)
                lr_val = jnp.sum(jnp.where(mask_last, h_cur, 0), axis=0,
                                 keepdims=True)
                j_lr = t + 2 + b * BH - tlen_row
                lr_ok = (in_band_lr & (j_lr >= 1) & (j_lr <= qlen_row))
                dist = jnp.abs(tlen_row - j_lr)
                rtake = lr_ok & ((lr_val > rmax)
                                 | ((lr_val == rmax) & (dist < rdist)))
                rmax = jnp.where(rtake, lr_val, rmax)
                rdist = jnp.where(rtake, dist, rdist)
                rj = jnp.where(rtake, j_lr, rj)

            if with_traceback:
                # pack nibbles; flush per 8 steps (double-buffered DMA)
                phase = t % 8
                w = t // 8
                gw = b * WPB + w
                slot = gw % 2
                word_acc = jnp.where(
                    phase == 0, nib,
                    word_acc | (nib << (phase * 4).astype(jnp.uint32)))
                flush = (phase == 7) | (t == NT - 1)

                def _dma(word_idx, slot_idx):
                    return pltpu.make_async_copy(
                        pack_sl.at[pl.ds(slot_idx, 1)],
                        btr_ref.at[pl.ds(word_idx, 1), :,
                                   pl.ds(tile * LANES, LANES)],
                        dma_sem.at[slot_idx],
                    )

                @pl.when(flush & (gw >= 2))
                def _reuse():
                    _dma(gw - 2, slot).wait()

                @pl.when(flush)
                def _flush():
                    pack_sl[pl.ds(slot, 1)] = word_acc[None]
                    _dma(gw, slot).start()

            # rolled streams + inter-band carry I/O
            a_sh = pltpu.roll(a_cur, 1, 0)
            h_sh = pltpu.roll(h_cur, 1, 0)
            st0 = t - BH + 2
            if stream_carry:
                # windowed carry write: row st0 lands in chunk kw of the
                # write window; a full (or final-partial) chunk flushes to
                # HBM by async DMA.  Pre-wavefront steps (st0 < 1) write
                # the window's trash row (index CW).
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
                       pl.ds(stw, 1)] = a_sh[0:1][None, None]
                cw_win[pl.ds(slot_w, 1), 1:2,
                       pl.ds(stw, 1)] = h_sh[0:1][None, None]

                @pl.when(valid_w & ((st0 - kw * CW == CW - 1)
                                    | (t == NT - 1)))
                def _flush_w():
                    _cw_dma(kw, wr, slot_w).start()

                ld = jnp.minimum(t + 2, Qcp - 1)
                kr = ld // CW

                @pl.when(ld % CW == 0)
                def _gate_r():
                    _cr_dma(kr, rd).wait()

                @pl.when((ld % CW == 0) & (kr + 1 <= kr_max))
                def _pref_r():
                    _cr_dma(kr + 1, rd).start()

                a_sh = jnp.where(row0, cread(0, ld), a_sh)
                h_sh = jnp.where(row0, cread(1, ld), h_sh)

                tq = t + 1
                kq = tq // CW

                @pl.when(tq % CW == 0)
                def _gate_q():
                    _qp_dma(kq).wait()

                @pl.when((tq % CW == 0) & (kq + 1 <= kq_max))
                def _pref_q():
                    _qp_dma(kq + 1).start()

                qrow = qp_win[pl.ds(kq % 2, 1), pl.ds(tq - kq * CW, 1), :][0]
            else:
                st = jnp.where(st0 >= 1, st0, TRASH)
                carry_ref[pl.ds(wr, 1), 0:1,
                          pl.ds(st, 1)] = a_sh[0:1][None, None]
                carry_ref[pl.ds(wr, 1), 1:2,
                          pl.ds(st, 1)] = h_sh[0:1][None, None]
                ld = jnp.minimum(t + 2, Qcp - 1)
                a_sh = jnp.where(row0, cread(0, ld), a_sh)
                h_sh = jnp.where(row0, cread(1, ld), h_sh)

                qrow = qpad_ref[pl.ds(jnp.minimum(t + 1, QR - 1), 1), :]
            qd = jnp.where(row0, qrow, pltpu.roll(qd, 1, 0))

            return (h_cur, f_cur, a_sh, h_sh, h_sh_p, qd, word_acc,
                    mqe, mqe_t, rmax, rdist, rj)

        t_lo = jnp.maximum(jnp.clip(tlo_ref[b, tile], 0, NT),
                           jnp.int32(min(BH - 1, NT)))
        t_hi = jnp.clip(thi_ref[b, tile], t_lo, NT)
        carry = (h_un, f_un, a_p, h_sh_p, h_sh_pp, qd, word0,
                 *sm_carry)
        if _SW_BANDED_SEGMENTS:
            carry = jax.lax.fori_loop(
                0, min(BH - 1, NT),
                functools.partial(step, sample=True, ramp=True), carry)
            carry = jax.lax.fori_loop(
                min(BH - 1, NT), t_lo,
                functools.partial(step, sample=False, ramp=False), carry)
            carry = jax.lax.fori_loop(
                t_lo, t_hi, functools.partial(step, sample=True, ramp=False),
                carry)
            carry = jax.lax.fori_loop(
                t_hi, NT, functools.partial(step, sample=False, ramp=False),
                carry)
        else:
            carry = jax.lax.fori_loop(
                0, NT, functools.partial(step, sample=True, ramp=True),
                carry)
        if stream_carry:
            # drain this band's last two write flushes (earlier chunks
            # were gated in-loop at chunk entry) so the next band's reads
            # of this buffer observe completed HBM state
            _cw_dma(kw_last, wr, kw_last % 2).wait()
            if kw_last >= 1:
                _cw_dma(kw_last - 1, wr, (kw_last - 1) % 2).wait()
        return carry[-5:]

    one = jnp.ones((1, LANES), jnp.int32)
    sm0 = (jnp.full((1, LANES), NEG, jnp.int32), one,
           jnp.full((1, LANES), NEG, jnp.int32),
           jnp.full((1, LANES), 0x3FFFFFFF, jnp.int32), one)
    mqe, mqe_t, rmax, rdist, rj = jax.lax.fori_loop(0, NB, band, sm0)

    mqe_dist = jnp.abs(mqe_t - qlen_row)
    row_wins = (rmax > mqe) | ((rmax == mqe) & (rdist < mqe_dist))
    ez_ref[0:1] = mqe
    ez_ref[1:2] = mqe_t
    ez_ref[2:3] = jnp.where(row_wins, rmax, mqe)
    ez_ref[3:4] = jnp.where(row_wins, tlen_row, mqe_t)
    ez_ref[4:5] = jnp.where(row_wins, rj, qlen_row)
    ez_ref[5:6] = jnp.where(row_wins, qlen_row - rj, 0)

    if with_traceback:
        # drain the last two in-flight flushes
        G = NB * WPB

        def _dma_static(word_idx):
            return pltpu.make_async_copy(
                pack_sl.at[pl.ds(word_idx % 2, 1)],
                btr_ref.at[pl.ds(word_idx, 1), :,
                           pl.ds(tile * LANES, LANES)],
                dma_sem.at[word_idx % 2],
            )

        _dma_static(G - 1).wait()
        if G >= 2:
            _dma_static(G - 2).wait()


def _sw_score_kernel(
    mt_ref, mm_ref, go_ref, ge_ref, dmin_ref,
    tchar_ref, qpad_ref, tlen_ref, qlen_ref,
    score_ref,
    sc_buf, e_ref, f_ref, qd_ref, best_ref,
    *,
    R1p: int, D: int, indel_init: bool,
):
    """Score-only fast path: no gap counters, no per-diagonal outputs —
    the best alignment score (max over last row + last column, the value
    part of sw.cpp:100-127) accumulates on-device."""
    w_match = mt_ref[0, 0]
    w_mismatch = mm_ref[0, 0]
    w_open = go_ref[0, 0]
    w_ext = ge_ref[0, 0]

    row = jax.lax.broadcasted_iota(jnp.int32, (R1p, LANES), 0)
    tchar = tchar_ref[:]
    tlen_row = tlen_ref[0:1, :]
    qlen_row = qlen_ref[0:1, :]
    mask_lr = row == tlen_row
    neg = jnp.full((R1p, LANES), NEG, jnp.int32)

    def border(k):
        if indel_init:
            return jnp.where(k >= 1, -w_open - (k - 1) * w_ext, 0)
        return jnp.int32(0)

    sc_buf[0:1] = jnp.where(row == 0, 0, neg)[None]
    sc_buf[1:2] = jnp.where(row <= 1, border(jnp.int32(1)), neg)[None]
    e_ref[:] = neg
    f_ref[:] = neg
    qd_ref[:] = jnp.where(row == 0, qpad_ref[0:1, :], 0)
    best_ref[:] = jnp.full((1, LANES), NEG, jnp.int32)

    def body(d, _, *, sample: bool = True):
        sc_prev = sc_buf[pl.ds((d - 1) % 2, 1)][0]
        sc_prev2 = sc_buf[pl.ds(d % 2, 1)][0]

        qrow = qpad_ref[pl.ds(d - 1, 1), :]
        qdiag = jnp.where(row == 0, qrow, pltpu.roll(qd_ref[:], 1, 0))
        qd_ref[:] = qdiag

        sc_up = pltpu.roll(sc_prev, 1, 0)
        e_up = pltpu.roll(e_ref[:], 1, 0)
        e_cur = jnp.maximum(sc_up - w_open, e_up - w_ext)
        f_cur = jnp.maximum(sc_prev - w_open, f_ref[:] - w_ext)

        sub = jnp.where(qdiag == tchar, w_match, w_mismatch)
        diag_sc = pltpu.roll(sc_prev2, 1, 0) + sub
        sc_cur = jnp.maximum(diag_sc, jnp.maximum(e_cur, f_cur))

        boundary = (row == 0) | (row == d)
        sc_cur = jnp.where(boundary, border(d), sc_cur)
        e_cur = jnp.where(boundary, NEG, e_cur)
        f_cur = jnp.where(boundary, NEG, f_cur)

        sc_buf[pl.ds(d % 2, 1)] = sc_cur[None]
        e_ref[:] = e_cur
        f_ref[:] = f_cur

        # last-column cell (r = d - qlen, 1 <= r <= tlen) and last-row cell
        # (r = tlen, 1 <= d - tlen <= qlen), max-reduced per lane
        if sample:
            r_lc = d - qlen_row
            lc_mask = (row == r_lc) & (r_lc >= 1) & (r_lc <= tlen_row)
            c_lr = d - tlen_row
            lr_mask = mask_lr & (c_lr >= 1) & (c_lr <= qlen_row)
            cand = jnp.max(jnp.where(lc_mask | lr_mask, sc_cur, NEG),
                           axis=0, keepdims=True)
            best_ref[:] = jnp.maximum(best_ref[:], cand)
        return 0

    dmin = jnp.clip(dmin_ref[0, pl.program_id(0)], 2, D)
    jax.lax.fori_loop(2, dmin, functools.partial(body, sample=False), 0)
    jax.lax.fori_loop(dmin, D, body, 0)
    score_ref[:] = best_ref[:]


@functools.partial(jax.jit, static_argnames=("indel_init", "interpret"))
def sw_pallas_scores(
    tchar, qpad, tlen, qlen,
    match, mismatch, gap_open, gap_ext,
    *,
    indel_init: bool,
    interpret: bool = False,
):
    """Best-alignment-score-only forward: returns (1, Bp) int32."""
    R1p, Bp = tchar.shape
    QP = qpad.shape[0]
    D = QP + 1

    kernel = functools.partial(_sw_score_kernel, R1p=R1p, D=D,
                               indel_init=indel_init)
    col = lambda i: (0, i)
    scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    n_tiles = Bp // LANES
    valid = tlen > 0
    dlane = jnp.where(valid, jnp.minimum(tlen, qlen), jnp.int32(0x7FFFFFF))
    dmin = jnp.min(dlane.reshape(n_tiles, LANES), axis=1)[None, :] + 1
    score = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            scalar, scalar, scalar, scalar,
            pl.BlockSpec((1, n_tiles), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R1p, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((QP, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, R1p, LANES), jnp.int32),
            pltpu.VMEM((R1p, LANES), jnp.int32),
            pltpu.VMEM((R1p, LANES), jnp.int32),
            pltpu.VMEM((R1p, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        interpret=_imode(interpret),
    )(
        jnp.asarray([[match]], jnp.int32), jnp.asarray([[mismatch]], jnp.int32),
        jnp.asarray([[gap_open]], jnp.int32), jnp.asarray([[gap_ext]], jnp.int32),
        dmin.astype(jnp.int32),
        tchar, qpad, tlen, qlen,
    )
    return score


@functools.partial(
    jax.jit,
    static_argnames=("indel_init", "with_traceback", "interpret"),
)
def sw_pallas_forward(
    tchar,   # (R1p, Bp) int32: target char per DP row (row 0 unused)
    qpad,    # (QP, Bp) int32: query chars padded to >= T+Q
    tlen,    # (1, Bp) int32
    qlen,    # (1, Bp) int32
    match, mismatch, gap_open, gap_ext,  # () int32
    *,
    indel_init: bool,
    with_traceback: bool,
    interpret: bool = False,
):
    """with_traceback=True  -> returns (ez, btr_packed):
      ez: (6, Bp) int32 on-device ScoreMax
          rows: mqe, mqe_t, max, max_t, max_q, seg_length
      btr_packed: (ceil((D-2)/8), R1p, Bp) uint32 nibble-packed traceback
    with_traceback=False -> returns (lc, lr):
      (D-2, Bp) int32 last-column/last-row samples per diagonal.
    """
    R1p, Bp = tchar.shape
    QP = qpad.shape[0]
    T = R1p - 1
    # true D uses unpadded T: caller guarantees R1p = round_up(T+1, 8) and
    # qpad sized so that all real diagonals are covered.
    D = QP + 1            # diagonals 2 .. D-1; QP >= T + Q ensures coverage
    Dm = D - 2
    n_words = _round_up(Dm, 8) // 8

    grid = (Bp // LANES,)
    kernel = functools.partial(
        _sw_kernel, R1p=R1p, D=D,
        indel_init=indel_init, with_traceback=with_traceback,
    )

    def col(i):
        return (0, i)

    scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    if with_traceback:
        out_shapes = [
            jax.ShapeDtypeStruct((6, Bp), jnp.int32),
            jax.ShapeDtypeStruct((n_words, R1p, Bp), jnp.uint32),
        ]
        out_specs = [
            pl.BlockSpec((6, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((Dm, Bp), jnp.int32),
            jax.ShapeDtypeStruct((Dm, Bp), jnp.int32),
        ]
        out_specs = [
            pl.BlockSpec((Dm, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Dm, LANES), col, memory_space=pltpu.VMEM),
        ]

    scratch_shapes = [
        pltpu.VMEM((2, R1p, LANES), jnp.int32),   # sc ping-pong
        pltpu.VMEM((R1p, LANES), jnp.int32),      # E
        pltpu.VMEM((R1p, LANES), jnp.int32),      # F
        pltpu.VMEM((R1p, LANES), jnp.int32),      # qdiag
    ]
    if with_traceback:
        scratch_shapes += [
            pltpu.VMEM((2, R1p, LANES), jnp.uint32),  # nibble staging x2
            pltpu.SemaphoreType.DMA((2,)),             # per-slot flush sems
        ]

    n_tiles = Bp // LANES
    valid = tlen > 0
    dlane = jnp.where(valid, jnp.minimum(tlen, qlen), jnp.int32(0x7FFFFFF))
    dmin = jnp.min(dlane.reshape(n_tiles, LANES), axis=1)[None, :] + 1

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scalar, scalar, scalar, scalar,
            pl.BlockSpec((1, n_tiles), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((R1p, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((QP, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        interpret=_imode(interpret),
    )(
        jnp.asarray([[match]], jnp.int32), jnp.asarray([[mismatch]], jnp.int32),
        jnp.asarray([[gap_open]], jnp.int32), jnp.asarray([[gap_ext]], jnp.int32),
        dmin.astype(jnp.int32),
        tchar, qpad, tlen, qlen,
    )
    if with_traceback:
        ez, btr = outs
        return ez, btr
    lc, lr = outs
    return lc, lr, None


@functools.partial(jax.jit,
                   static_argnames=("indel_init", "band", "with_traceback",
                                    "interpret", "stream", "stream_carry",
                                    "carry_window"))
def sw_pallas_banded(
    tchar_b,  # (Rb, Bp) int32 target chars (row k = matrix row k+1)
    qpad,     # (QR, Bp) int32 query chars (row t = query base t), QR = Q+BH
    tlen,     # (1, Bp) int32
    qlen,     # (1, Bp) int32
    match, mismatch, gap_open, gap_ext,
    *,
    indel_init: bool,
    band: int = 32,
    with_traceback: bool = True,
    interpret: bool = False,
    stream: bool = False,
    stream_carry: bool = False,
    carry_window: int = 256,
):
    """Banded SW forward with traceback.  Returns (ez, btr):
      ez:  (6, Bp) int32 — mqe, mqe_t, max, max_t, max_q, seg_length
      btr: (NB*WPB, BH, Bp) uint32 band-major nibble words: cell (i, j) of
           band b=(i-1)//BH, sublane s=(i-1)%BH at t=j-1+s lives in word
           b*WPB + t//8, nibble t%8.
    """
    Rb, Bp = tchar_b.shape
    QR = qpad.shape[0]
    BH = band
    NB = Rb // BH
    Q = QR - BH
    NT = Q + BH - 1
    Qcp = _round_up(Q + BH + 4, 8)
    WPB = (NT + 7) // 8
    G = NB * WPB
    n_tiles = Bp // LANES

    # per-(band, tile) ScoreMax sampling windows
    tl = tlen[0].astype(jnp.int32)
    ql = qlen[0].astype(jnp.int32)
    bidx = jnp.arange(NB, dtype=jnp.int32)[:, None]
    srem = tl[None, :] - 1 - bidx * BH           # rows of tlen rel. to band
    lc_valid = (srem >= 0) & (ql[None, :] >= 1)
    lc_lo = jnp.broadcast_to(ql[None, :] - 1, srem.shape)
    lc_hi = ql[None, :] + jnp.minimum(BH - 1, srem) + 1
    lr_valid = (srem >= 0) & (srem < BH)
    lr_lo = srem
    lr_hi = srem + ql[None, :]
    BIG = jnp.int32(0x7FFFFFF)
    lane_lo = jnp.minimum(jnp.where(lc_valid, lc_lo, BIG),
                          jnp.where(lr_valid, lr_lo, BIG))
    lane_hi = jnp.maximum(jnp.where(lc_valid, lc_hi, 0),
                          jnp.where(lr_valid, lr_hi, 0))
    tlo = jnp.min(lane_lo.reshape(NB, n_tiles, LANES), axis=2)
    thi = jnp.max(lane_hi.reshape(NB, n_tiles, LANES), axis=2)

    CW = carry_window
    if stream_carry and qpad.shape[0] % CW:
        # qpad rows pad up to the DMA chunk size (chunk k spans rows
        # [k*CW, (k+1)*CW); reads never pass NT <= QR-1, pad is dead)
        qpad = jnp.pad(qpad, ((0, _round_up(QR, CW) - QR), (0, 0)))

    kernel = functools.partial(
        _sw_banded_kernel, BH=BH, NB=NB, NT=NT, Qcp=Qcp, QR=QR, WPB=WPB,
        indel_init=indel_init, with_traceback=with_traceback, stream=stream,
        stream_carry=stream_carry, CW=CW)
    col = lambda i: (0, i)
    scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sm = pl.BlockSpec((NB, n_tiles), lambda i: (0, 0),
                      memory_space=pltpu.SMEM)
    # In stream_carry (long-query) mode the inter-band carry lives in HBM
    # and CW-column windows stream through VMEM (no query-length cliff).
    # Mosaic only allows vmem/smem/semaphore *scratch*, so the HBM buffer
    # rides as an extra pl.ANY output (discarded by the caller) — placed
    # right after ez/btr so the kernel's flattened ref order is identical
    # to the carry-as-first-scratch layout of the VMEM mode.
    if stream_carry:
        Qcph = _round_up(Qcp, CW)
        carry_spec = pl.BlockSpec(memory_space=pl.ANY)
        carry_shape = jax.ShapeDtypeStruct((2, 2, Qcph, LANES), jnp.int32)
    if with_traceback:
        out_specs = [
            pl.BlockSpec((6, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((6, Bp), jnp.int32),
            jax.ShapeDtypeStruct((G, BH, Bp), jnp.uint32),
        ]
        scratch_shapes = [
            pltpu.VMEM((2, BH, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if stream_carry:
            out_specs.append(carry_spec)
            out_shape.append(carry_shape)
        else:
            scratch_shapes.insert(0, pltpu.VMEM((2, 2, Qcp, LANES),
                                                jnp.int32))
    else:
        out_specs = [pl.BlockSpec((6, LANES), col, memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((6, Bp), jnp.int32)]
        if stream_carry:
            out_specs.append(carry_spec)
            out_shape.append(carry_shape)
            scratch_shapes = []
        else:
            scratch_shapes = [pltpu.VMEM((2, 2, Qcp, LANES), jnp.int32)]
    if stream:
        # long-target mode: whole tchar stays in HBM; the kernel streams
        # (BH, LANES) band slices through double-buffered VMEM scratch
        tchar_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((2, BH, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        tchar_spec = pl.BlockSpec((Rb, LANES), col, memory_space=pltpu.VMEM)
    if stream_carry:
        qpad_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((2, 2, CW, LANES), jnp.int32),      # carry read win
            pltpu.VMEM((2, 2, CW + 8, LANES), jnp.int32),  # carry write win
            pltpu.VMEM((2, CW, LANES), jnp.int32),         # qpad window
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        qpad_spec = pl.BlockSpec((QR, LANES), col, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            scalar, scalar, scalar, scalar, sm, sm,
            tchar_spec,
            qpad_spec,
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_imode(interpret),
    )(
        jnp.asarray([[match]], jnp.int32), jnp.asarray([[mismatch]], jnp.int32),
        jnp.asarray([[gap_open]], jnp.int32), jnp.asarray([[gap_ext]], jnp.int32),
        tlo.astype(jnp.int32), thi.astype(jnp.int32),
        tchar_b, qpad, tlen, qlen,
    )
    if with_traceback:
        return outs[0], outs[1]
    return outs[0], None


def prepare_inputs_banded(targets: np.ndarray, tlen: np.ndarray,
                          queries: np.ndarray, qlen: np.ndarray,
                          band: int = 32):
    """(B, T)/(B, Q) batches -> lane-major arrays for sw_pallas_banded."""
    B, T = targets.shape
    Q = queries.shape[1]
    Bp = _round_up(max(B, 1), LANES)
    Rb = _round_up(max(T, 1), band)
    QR = _round_up(Q + band, 8)

    tchar = np.zeros((Rb, Bp), np.int32)
    tchar[:T, :B] = targets.T
    qp = np.zeros((QR, Bp), np.int32)
    qp[:Q, :B] = queries.T
    tl = np.zeros((1, Bp), np.int32)
    tl[0, :B] = tlen
    ql = np.ones((1, Bp), np.int32)
    ql[0, :B] = qlen
    return tchar, qp, tl, ql


def align_batch_banded(
    targets: list[bytes],
    queries: list[bytes],
    params,
    strategy,
    band: int = 32,
    stream: bool = False,
    stream_carry: bool = False,
) -> list[tuple[str, int]]:
    """align_batch through the banded kernel (band-major nibble decode)."""
    from mgl_tpu.core.params import OverhangStrategy
    from mgl_tpu.ops.cigar import decode_nib_fn

    B = len(targets)
    tlen = np.array([len(t) for t in targets], dtype=np.int32)
    qlen = np.array([len(q) for q in queries], dtype=np.int32)
    T, Q = int(tlen.max()), int(qlen.max())
    tbuf = np.zeros((B, T), dtype=np.int32)
    qbuf = np.zeros((B, Q), dtype=np.int32)
    for i, (t, q) in enumerate(zip(targets, queries)):
        tbuf[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
        qbuf[i, : len(q)] = np.frombuffer(q, dtype=np.uint8)

    tchar, qp, tl, ql = prepare_inputs_banded(tbuf, tlen, qbuf, qlen, band)
    indel_init = bool(
        strategy & (OverhangStrategy.INDEL | OverhangStrategy.LEADING_INDEL))
    ez_dev, btr = sw_pallas_banded(
        jnp.asarray(tchar), jnp.asarray(qp), jnp.asarray(tl), jnp.asarray(ql),
        params.match, params.mismatch, params.gap_open, params.gap_extend,
        indel_init=indel_init, band=band, interpret=env_interpret(),
        stream=stream, stream_carry=stream_carry)
    ez_np = np.asarray(ez_dev)[:, :B].astype(np.int64)
    ez = dict(zip(("mqe", "mqe_t", "max", "max_t", "max_q", "seg_length"),
                  ez_np))
    # transfer only the real lanes (device-side slice): long-pair batches
    # with few pairs otherwise ship up to 128x the traceback bytes
    btr = np.asarray(btr[:, :, :B] if B < btr.shape[2] else btr)
    QR = qp.shape[0]
    WPB = (QR - band + band - 1 + 7) // 8

    from mgl_tpu.native import cigar_decode_bulk_banded

    native = cigar_decode_bulk_banded(btr, ez, tlen, qlen, int(strategy),
                                      band, WPB, device_layout=True)
    if native is not None:
        return native

    out = []
    for b in range(B):
        wb = btr[:, :, b]

        def nib(i, j, wb=wb):
            s = (i - 1) % band
            t = (j - 1) + s
            g = ((i - 1) // band) * WPB + (t >> 3)
            return (int(wb[g, s]) >> ((t & 7) * 4)) & 0xF

        ez_b = {k: v[b] for k, v in ez.items()}
        out.append(decode_nib_fn(nib, ez_b, int(tlen[b]), int(qlen[b]),
                                 strategy))
    return out


def align_batch(
    targets: list[bytes],
    queries: list[bytes],
    params,
    strategy,
) -> list[tuple[str, int]]:
    """Full pipeline through the Pallas kernel: forward + on-device
    ScoreMax + nibble CIGAR decode.  Same contract as ops.sw.align_batch."""
    from mgl_tpu.core.params import OverhangStrategy
    from mgl_tpu.ops.cigar import decode_packed_one

    B = len(targets)
    tlen = np.array([len(t) for t in targets], dtype=np.int32)
    qlen = np.array([len(q) for q in queries], dtype=np.int32)
    T, Q = int(tlen.max()), int(qlen.max())
    tbuf = np.zeros((B, T), dtype=np.int32)
    qbuf = np.zeros((B, Q), dtype=np.int32)
    for i, (t, q) in enumerate(zip(targets, queries)):
        tbuf[i, : len(t)] = np.frombuffer(t, dtype=np.uint8)
        qbuf[i, : len(q)] = np.frombuffer(q, dtype=np.uint8)

    tchar, qp, tl, ql = prepare_inputs(tbuf, tlen, qbuf, qlen)
    indel_init = bool(
        strategy & (OverhangStrategy.INDEL | OverhangStrategy.LEADING_INDEL)
    )
    ez_dev, btr = sw_pallas_forward(
        jnp.asarray(tchar), jnp.asarray(qp), jnp.asarray(tl), jnp.asarray(ql),
        params.match, params.mismatch, params.gap_open, params.gap_extend,
        indel_init=indel_init, with_traceback=True,
    )
    ez_np = np.asarray(ez_dev)[:, :B].astype(np.int64)
    ez = dict(zip(("mqe", "mqe_t", "max", "max_t", "max_q", "seg_length"),
                  ez_np))
    btr = np.asarray(btr)

    from mgl_tpu.native import cigar_decode_bulk

    words = np.ascontiguousarray(btr[:, :, :B].transpose(2, 0, 1))
    native = cigar_decode_bulk(words, ez, tlen, qlen, int(strategy))
    if native is not None:
        return native
    out = []  # pragma: no cover - pure-Python fallback
    for b in range(B):
        ez_b = {k: v[b] for k, v in ez.items()}
        out.append(decode_packed_one(btr[:, :, b], ez_b, int(tlen[b]),
                                     int(qlen[b]), strategy))
    return out


def prepare_inputs(targets: np.ndarray, tlen: np.ndarray,
                   queries: np.ndarray, qlen: np.ndarray):
    """Host-side packing: (B, T)/(B, Q) row-major uint8/int32 batches ->
    lane-major padded device arrays for sw_pallas_forward."""
    B, T = targets.shape
    Q = queries.shape[1]
    Bp = _round_up(max(B, 1), LANES)
    R1p = _round_up(T + 1, 8)
    QP = _round_up(T + Q + 1, 8)

    tchar = np.zeros((R1p, Bp), np.int32)
    tchar[1: T + 1, :B] = targets.T
    qp = np.zeros((QP, Bp), np.int32)
    qp[:Q, :B] = queries.T
    tl = np.zeros((1, Bp), np.int32)
    tl[0, :B] = tlen
    ql = np.ones((1, Bp), np.int32)   # avoid d-qlen == d matching row d
    ql[0, :B] = qlen
    return tchar, qp, tl, ql

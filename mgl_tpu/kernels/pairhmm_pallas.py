"""Pallas TPU kernel for the batched PairHMM forward pass.

Performance path of ops/pairhmm.py — identical recurrence and scaling
(compute_prob_scalar.cc:39-43 / Context<float>), with all three DP state
planes (M/X/Y, two-diagonal history each) resident in VMEM:

* grid over batch tiles: 128 (read, hap) pairs per tile, one per lane;
* read rows in sublanes; per-diagonal dependency handled by cross-sublane
  rolls; haplotype characters stream through a rolling diagonal register;
* per-step work is pure f32 multiply-add (VPU), ~11 flops/cell/lane —
  the TPU analogue of the reference's 3-FMA AVX cell
  (compute_prob_avxf.cc:114-156);
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
AMBIG = ord("N")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pairhmm_kernel(
    hpad_ref, rchar_ref, rslen_ref, haplen_ref,
    p_mm_ref, p_gapm_ref, p_mx_ref, p_my_ref, p_zz_ref,
    dm_ref, dmm_ref, y_init_ref,
    score_ref,
    m_buf, x_buf, y_buf, hd_ref, acc_ref,
    *,
    R1p: int, D: int,
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

    zero = jnp.zeros((R1p, LANES), jnp.float32)
    y0 = jnp.where(row == 0, y_init, 0.0)
    # diag 0 (slot 0) and diag 1 (slot 1): M=X=0 everywhere; Y=yInit at row 0
    m_buf[0:1], m_buf[1:2] = zero[None], zero[None]
    x_buf[0:1], x_buf[1:2] = zero[None], zero[None]
    y_buf[0:1], y_buf[1:2] = y0[None], y0[None]
    hd_ref[:] = jnp.where(row == 0, hpad_ref[0:1, :], 0)
    acc_ref[:] = jnp.zeros((1, LANES), jnp.float32)

    def body(d, _):
        m_prev = m_buf[pl.ds((d - 1) % 2, 1)][0]
        x_prev = x_buf[pl.ds((d - 1) % 2, 1)][0]
        y_prev = y_buf[pl.ds((d - 1) % 2, 1)][0]
        m_prev2 = m_buf[pl.ds(d % 2, 1)][0]
        x_prev2 = x_buf[pl.ds(d % 2, 1)][0]
        y_prev2 = y_buf[pl.ds(d % 2, 1)][0]

        hrow = hpad_ref[pl.ds(d - 1, 1), :]
        hapdiag = jnp.where(row == 0, hrow, pltpu.roll(hd_ref[:], 1, 0))
        hd_ref[:] = hapdiag

        is_match = (rchar == hapdiag) | (rchar == AMBIG) | (hapdiag == AMBIG)
        distm = jnp.where(is_match, dm, dmm)

        m_d2 = pltpu.roll(m_prev2, 1, 0)
        x_d2 = pltpu.roll(x_prev2, 1, 0)
        y_d2 = pltpu.roll(y_prev2, 1, 0)
        m_cur = distm * (m_d2 * p_mm + (x_d2 + y_d2) * p_gapm)

        y_cur = m_prev * p_my + y_prev * p_zz

        m_d1 = pltpu.roll(m_prev, 1, 0)
        x_d1 = pltpu.roll(x_prev, 1, 0)
        x_cur = m_d1 * p_mx + x_d1 * p_zz

        row0 = row == 0
        col0 = row == d
        bz = row0 | col0
        m_cur = jnp.where(bz, 0.0, m_cur)
        x_cur = jnp.where(bz, 0.0, x_cur)
        y_cur = jnp.where(col0, 0.0, jnp.where(row0, y_init, y_cur))

        m_buf[pl.ds(d % 2, 1)] = m_cur[None]
        x_buf[pl.ds(d % 2, 1)] = x_cur[None]
        y_buf[pl.ds(d % 2, 1)] = y_cur[None]

        # last-row contribution: cell (rslen, c=d-rslen), valid 1 <= c <= haplen
        contrib = jnp.sum(jnp.where(mask_last, m_cur + x_cur, 0.0),
                          axis=0, keepdims=True)
        c = d - rl_row
        lane_valid = (c >= 1) & (c <= hl_row)
        acc_ref[:] = acc_ref[:] + jnp.where(lane_valid, contrib, 0.0)
        return 0

    jax.lax.fori_loop(2, D, body, 0)
    score_ref[:] = acc_ref[:]


@jax.jit
def pairhmm_pallas_forward(
    hpad,      # (HP, Bp) int32 hap chars, HP >= R1p + H
    rchar,     # (R1p, Bp) int32 read chars per row (row 0 unused)
    rslen,     # (1, Bp) int32
    haplen,    # (1, Bp) int32
    p_mm, p_gapm, p_mx, p_my, p_zz,   # (R1p, Bp) f32
    dm, dmm,   # (R1p, Bp) f32 emission rows
    y_init,    # (1, Bp) f32
):
    """Returns (1, Bp) f32 INITIAL_CONSTANT-scaled scores."""
    R1p, Bp = rchar.shape
    HP = hpad.shape[0]
    D = HP + 1

    grid = (Bp // LANES,)
    kernel = functools.partial(_pairhmm_kernel, R1p=R1p, D=D)

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
        scratch_shapes=[
            pltpu.VMEM((2, R1p, LANES), jnp.float32),   # M ping-pong
            pltpu.VMEM((2, R1p, LANES), jnp.float32),   # X
            pltpu.VMEM((2, R1p, LANES), jnp.float32),   # Y
            pltpu.VMEM((R1p, LANES), jnp.int32),        # hap diagonal
            pltpu.VMEM((1, LANES), jnp.float32),        # accumulator
        ],
    )(hpad, rchar, rslen, haplen, p_mm, p_gapm, p_mx, p_my, p_zz, dm, dmm, y_init)
    return score


def prepare_inputs(batch):
    """Transpose a PairHMMBatch (ops/pairhmm.py) into lane-major padded
    arrays for pairhmm_pallas_forward."""
    B, R = batch.rchar.shape
    H = batch.hap.shape[1]
    Bp = _round_up(max(B, 1), LANES)
    R1p = _round_up(R, 8)
    HP = _round_up(R1p + H + 1, 8)

    def t2(a, dtype):
        out = np.zeros((a.shape[1], Bp), dtype)
        out[: a.shape[1], :B] = a.T
        return out

    def pad_rows(a, rows, dtype):
        out = np.zeros((rows, Bp), dtype)
        out[: a.shape[1], :B] = a.T
        return out

    hpad = pad_rows(batch.hap, HP, np.int32)
    rchar = pad_rows(batch.rchar, R1p, np.int32)
    args = dict(
        hpad=hpad,
        rchar=rchar,
        rslen=pad_rows(batch.rslen[:, None], 1, np.int32),
        haplen=np.maximum(pad_rows(batch.haplen[:, None], 1, np.int32), 1),
        p_mm=pad_rows(batch.p_mm, R1p, np.float32),
        p_gapm=pad_rows(batch.p_gapm, R1p, np.float32),
        p_mx=pad_rows(batch.p_mx, R1p, np.float32),
        p_my=pad_rows(batch.p_my, R1p, np.float32),
        p_zz=pad_rows(batch.p_zz, R1p, np.float32),
        dm=pad_rows(batch.distm_match, R1p, np.float32),
        dmm=pad_rows(batch.distm_mis, R1p, np.float32),
        y_init=pad_rows(batch.y_init[:, None], 1, np.float32),
    )
    return args


def forward_scores(batch) -> np.ndarray:
    """Host convenience: PairHMMBatch -> (B,) f32 scaled scores."""
    B = batch.rchar.shape[0]
    args = prepare_inputs(batch)
    score = pairhmm_pallas_forward(
        jnp.asarray(args["hpad"]), jnp.asarray(args["rchar"]),
        jnp.asarray(args["rslen"]), jnp.asarray(args["haplen"]),
        jnp.asarray(args["p_mm"]), jnp.asarray(args["p_gapm"]),
        jnp.asarray(args["p_mx"]), jnp.asarray(args["p_my"]),
        jnp.asarray(args["p_zz"]), jnp.asarray(args["dm"]),
        jnp.asarray(args["dmm"]), jnp.asarray(args["y_init"]),
    )
    return np.asarray(score)[0, :B]

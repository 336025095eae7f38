"""On-device CIGAR traceback walk over the banded kernel's nibble words.

The banded SW kernel leaves its 4-bit traceback in HBM as (G, BH, Bp)
uint32 words (kernels/sw_pallas.py).  Decoding on the host means fetching
~21 KB per pair; behind this dev environment's tunnel that is the entire
cost of CIGAR-mode mapping's traceback tier (and on any hardware it is
10-100x more bytes than the result).  This module walks the traceback on
device instead — a lax.scan automaton steps every lane one matrix cell
per iteration, follows the run-length protocol of the reference's
backtrack (sw.cpp:182-214; executable spec ops/cigar.decode_nib_fn), and
emits packed (state, length) segments.  Only the segments (~100 B/pair)
transfer; the host applies the strategy-specific overhang tail
(sw.cpp:224-248) and formats the strings.

Per-cell automaton == the spec's run walk: a DEL run's cells are rows
I, I-1, ... while the E-extend bit (bit 2) holds at each row (same J);
INS runs walk columns under the F-extend bit (bit 3); adjacent same-state
runs merge into one segment exactly as the spec's state-change test does.
The walk ends when a run completes with I == 0 or J == 0.
"""

from __future__ import annotations

import numpy as np

from mgl_tpu.core.params import (OverhangStrategy, STATE_CLIP, STATE_DEL,
                                 STATE_INS, STATE_MATCH)

SEG_CAP = 24          # max walk segments held per lane before overflow

_jitted = None


def _walk_fn():
    global _jitted
    if _jitted is None:
        import functools

        import jax

        _jitted = functools.partial(
            jax.jit, static_argnames=("BH", "WPB", "strategy", "n_steps",
                                      "seg_cap"))(_walk_segments)
    return _jitted


def _walk_segments(btr, ez, tlen, qlen, *, BH: int, WPB: int, strategy: int,
                   n_steps: int, seg_cap: int = SEG_CAP):
    """Walk all lanes' tracebacks.  btr: (G, BH, Bp) uint32; ez: (6, Bp)
    int32 (mqe, mqe_t, max, max_t, max_q, seg_length); tlen/qlen: (Bp,).

    Returns (segs (seg_cap, Bp) int32 packed state | len << 2 in walk
    order, tail (5, Bp) int32 = [nseg, cur_state, cur_len, I_end, J_end],
    overflow (Bp,) bool).
    """
    import jax
    import jax.numpy as jnp

    G, BH_, Bp = btr.shape
    flat = btr.reshape(-1)

    # strategy-specific walk start (sw.cpp:155-170)
    if strategy == int(OverhangStrategy.INDEL):
        I0, J0 = tlen, qlen
    elif strategy == int(OverhangStrategy.LEADING_INDEL):
        I0, J0 = ez[1], qlen
    else:
        I0, J0 = ez[3], ez[4]

    def nib_at(I, J):
        s = (I - 1) % BH
        t = (J - 1) + s
        g = ((I - 1) // BH) * WPB + (t >> 3)
        idx = (g * BH + s) * Bp + jnp.arange(Bp, dtype=jnp.int32)
        w = jnp.take(flat, idx)
        return (w >> ((t & 7).astype(jnp.uint32) * 4)) & 0xF

    NORMAL, INSRUN, DELRUN = 0, 1, 2

    def step(carry, _):
        I, J, mode, cur_state, cur_len, nseg, done, segs, over = carry
        n = nib_at(jnp.maximum(I, 1), jnp.maximum(J, 1)).astype(jnp.int32)
        move = n & 3
        # cell state + next position + next mode per current mode
        norm_state = move                     # 0=M, 1=INS, 2=DEL
        norm_dI = jnp.where((move == 0) | (move == 2), 1, 0)
        norm_dJ = jnp.where((move == 0) | (move == 1), 1, 0)
        norm_next = jnp.where((move == 2) & ((n & 4) != 0), DELRUN,
                              jnp.where((move == 1) & ((n & 8) != 0),
                                        INSRUN, NORMAL))
        del_ext = (n & 4) != 0
        ins_ext = (n & 8) != 0
        cell_state = jnp.where(mode == NORMAL, norm_state,
                               jnp.where(mode == DELRUN, 2, 1))
        dI = jnp.where(mode == NORMAL, norm_dI,
                       jnp.where(mode == DELRUN, 1, 0))
        dJ = jnp.where(mode == NORMAL, norm_dJ,
                       jnp.where(mode == INSRUN, 1, 0))
        next_mode = jnp.where(
            mode == NORMAL, norm_next,
            jnp.where(mode == DELRUN,
                      jnp.where(del_ext, DELRUN, NORMAL),
                      jnp.where(ins_ext, INSRUN, NORMAL)))
        act = ~done
        same = cell_state == cur_state
        push = act & ~same
        slot = jnp.minimum(nseg, seg_cap - 1)
        packed = cur_state | (cur_len << 2)
        lane = jnp.arange(Bp)
        segs = segs.at[slot, lane].set(
            jnp.where(push, packed, segs[slot, lane]))
        over = over | (push & (nseg >= seg_cap))
        nseg = nseg + jnp.where(push, 1, 0)
        cur_len = jnp.where(act, jnp.where(same, cur_len + 1, 1), cur_len)
        cur_state = jnp.where(act, cell_state, cur_state)
        I2 = jnp.where(act, I - dI, I)
        J2 = jnp.where(act, J - dJ, J)
        done2 = done | (act & ~((I2 > 0) & (J2 > 0)))
        mode2 = jnp.where(act, next_mode, mode)
        return (I2, J2, mode2, cur_state, cur_len, nseg, done2, segs,
                over), None

    z = jnp.zeros(Bp, jnp.int32)
    init = (I0.astype(jnp.int32), J0.astype(jnp.int32), z, z, z, z,
            # lanes that start outside the matrix never walk
            ~((I0 > 0) & (J0 > 0)),
            jnp.zeros((seg_cap, Bp), jnp.int32),
            jnp.zeros(Bp, bool))
    (I, J, _, cur_state, cur_len, nseg, done, segs, over), _ = (
        jax.lax.scan(step, init, None, length=n_steps))
    over = over | ~done          # walk didn't finish: decode on host
    tail = jnp.stack([nseg, cur_state, cur_len, I, J])
    return segs, tail, over


_STATE_CHR = {0: STATE_MATCH, 1: STATE_INS, 2: STATE_DEL}


def finish_cigars(segs: np.ndarray, tail: np.ndarray, ez: dict,
                  tlen: np.ndarray, qlen: np.ndarray, strategy,
                  n_pairs: int) -> list:
    """Strategy tail + string formatting for the device walk's segments
    (sw.cpp:224-252 semantics; identical to ops/cigar.decode_nib_fn's
    post-processing).  Returns list[(cigar, offset) | None] — None where
    the lane overflowed and needs the host decoder."""
    out = []
    softclip = strategy == OverhangStrategy.SOFTCLIP
    ignore = strategy == OverhangStrategy.IGNORE
    for b in range(n_pairs):
        nseg, cur_state, cur_len, I, J = (int(tail[k, b]) for k in range(5))
        result = []
        if softclip:
            seg0 = int(ez["seg_length"][b])
            if seg0 > 0:
                result.append((STATE_CLIP, seg0))
        # nseg can exceed the buffer on overflowed lanes (the walk keeps
        # counting past seg_cap); the caller replaces those lanes with
        # None, but this formatting pass still runs over them first
        for k in range(min(nseg, segs.shape[0])):
            p = int(segs[k, b])
            result.append((_STATE_CHR[p & 3], p >> 2))
        state = _STATE_CHR[cur_state]
        if softclip:
            result.append((state, cur_len))
            if J > 0:
                result.append((STATE_CLIP, J))
            offset = I
        elif ignore:
            result.append((state, cur_len + J))
            offset = I - J
        else:
            result.append((state, cur_len))
            if I > 0:
                result.append((STATE_DEL, I))
            elif J > 0:
                result.append((STATE_INS, J))
            offset = 0
        cigar = "".join(f"{n}{s}" for s, n in reversed(result) if n > 0)
        out.append((cigar, offset))
    return out


def decode_cigars_device(btr_dev, ez_dev, wlen: int, qlen: int,
                         strategy, n_pairs: int, BH: int, WPB: int) -> list:
    """Device walk + host tail for uniform-shape pairs (the mapper's
    window batches).  btr_dev/ez_dev are the kernel's device outputs.
    Lanes whose walk overflowed SEG_CAP segments return None (caller
    falls back to the host decoder for those)."""
    import jax.numpy as jnp

    Bp = btr_dev.shape[2]
    tl = jnp.full(Bp, wlen, jnp.int32)
    ql = jnp.full(Bp, qlen, jnp.int32)
    segs, tail, over = _walk_fn()(
        btr_dev, ez_dev, tl, ql, BH=BH, WPB=WPB, strategy=int(strategy),
        n_steps=wlen + qlen, seg_cap=SEG_CAP)
    segs = np.asarray(segs)
    tail = np.asarray(tail)
    over = np.asarray(over)
    ez_np = np.asarray(ez_dev)[:, :n_pairs].astype(np.int64)
    ez = dict(zip(("mqe", "mqe_t", "max", "max_t", "max_q", "seg_length"),
                  ez_np))
    res = finish_cigars(segs, tail, ez, np.full(n_pairs, wlen),
                        np.full(n_pairs, qlen), strategy, n_pairs)
    for b in range(n_pairs):
        if over[b]:
            res[b] = None
    return res

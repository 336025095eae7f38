"""Host-side CIGAR decode from the device-produced backtrack.

Replays the reference's run-length backtrack walk and overhang
post-processing (sw.cpp:149-255) against the diag-major backtrack emitted by
ops/sw.py: cell (i, j) of pair b lives at btr[i + j - 2, b, i] (the forward
pass emits diagonals d = 2 .. T+Q).

The walk visits O(#segments) cells per pair (run-length jumps), so a Python
loop is cheap; mgl_tpu.native provides a C++ fast path for bulk decode.
"""

from __future__ import annotations

import numpy as np

from mgl_tpu.core.params import (
    OverhangStrategy,
    STATE_CLIP,
    STATE_DEL,
    STATE_INS,
    STATE_MATCH,
)


def decode_one(
    btr: np.ndarray,        # (D, R) int16 diag-major backtrack for one pair
    ez: dict,               # scalar ScoreMax entries for this pair
    tlen: int,
    qlen: int,
    strategy: OverhangStrategy,
) -> tuple[str, int]:
    segment_length = 0
    if strategy == OverhangStrategy.INDEL:
        I, J = tlen, qlen
    elif strategy != OverhangStrategy.LEADING_INDEL:
        I, J = int(ez["max_t"]), int(ez["max_q"])
        segment_length = int(ez["seg_length"])
    else:
        I, J = int(ez["mqe_t"]), qlen

    result = []
    if segment_length > 0 and strategy == OverhangStrategy.SOFTCLIP:
        result.append((STATE_CLIP, segment_length))
        segment_length = 0

    state = STATE_MATCH
    while True:
        b = int(btr[I + J - 2, I])
        if b > 0:
            next_state, step_length = STATE_DEL, b
        elif b < 0:
            next_state, step_length = STATE_INS, -b
        else:
            next_state, step_length = STATE_MATCH, 1

        if next_state == STATE_MATCH:
            I -= 1
            J -= 1
        elif next_state == STATE_INS:
            J -= step_length
        else:
            I -= step_length

        if next_state == state:
            segment_length += step_length
        else:
            result.append((state, segment_length))
            segment_length = step_length
            state = next_state

        if not (I > 0 and J > 0):
            break

    if strategy == OverhangStrategy.SOFTCLIP:
        result.append((state, segment_length))
        if J > 0:
            result.append((STATE_CLIP, J))
        offset = I
    elif strategy == OverhangStrategy.IGNORE:
        result.append((state, segment_length + J))
        offset = I - J
    else:
        result.append((state, segment_length))
        if I > 0:
            result.append((STATE_DEL, I))
        elif J > 0:
            result.append((STATE_INS, J))
        offset = 0

    cigar = "".join(f"{n}{s}" for s, n in reversed(result) if n > 0)
    return cigar, offset


def decode_packed_one(
    words: np.ndarray,      # (W, R1p) uint32: nibble-packed diagonals for one pair
    ez: dict,
    tlen: int,
    qlen: int,
    strategy: OverhangStrategy,
) -> tuple[str, int]:
    """CIGAR decode from the plane Pallas kernel's 4-bit traceback
    (diag-major: diagonal d at word (d-2)//8, nibble (d-2)%8, row i)."""
    def nib(i, j):
        k = i + j - 2
        return (int(words[k >> 3, i]) >> ((k & 7) * 4)) & 0xF

    return decode_nib_fn(nib, ez, tlen, qlen, strategy)


def decode_nib_fn(
    nib,                    # callable (i, j) -> 4-bit traceback nibble
    ez: dict,
    tlen: int,
    qlen: int,
    strategy: OverhangStrategy,
) -> tuple[str, int]:
    """CIGAR decode from a 4-bit traceback accessor.

    Nibble semantics (kernels/sw_pallas.py): bits0-1 move (0 diag / 1 INS /
    2 DEL), bit2 E-extend, bit3 F-extend.  Run lengths are rebuilt by
    walking the extend bits, which reproduces the reference's gap-run
    counters (sw.cpp:73-93) exactly.
    """
    segment_length = 0
    if strategy == OverhangStrategy.INDEL:
        I, J = tlen, qlen
    elif strategy != OverhangStrategy.LEADING_INDEL:
        I, J = int(ez["max_t"]), int(ez["max_q"])
        segment_length = int(ez["seg_length"])
    else:
        I, J = int(ez["mqe_t"]), qlen

    result = []
    if segment_length > 0 and strategy == OverhangStrategy.SOFTCLIP:
        result.append((STATE_CLIP, segment_length))
        segment_length = 0

    state = STATE_MATCH
    while True:
        n = nib(I, J)
        move = n & 3
        if move == 2:       # DEL run: walk E-extend bits upward
            L, k = 1, I
            while nib(k, J) & 4:
                k -= 1
                L += 1
            next_state, step_length = STATE_DEL, L
            I -= L
        elif move == 1:     # INS run: walk F-extend bits leftward
            L, k = 1, J
            while nib(I, k) & 8:
                k -= 1
                L += 1
            next_state, step_length = STATE_INS, L
            J -= L
        else:
            next_state, step_length = STATE_MATCH, 1
            I -= 1
            J -= 1

        if next_state == state:
            segment_length += step_length
        else:
            result.append((state, segment_length))
            segment_length = step_length
            state = next_state

        if not (I > 0 and J > 0):
            break

    if strategy == OverhangStrategy.SOFTCLIP:
        result.append((state, segment_length))
        if J > 0:
            result.append((STATE_CLIP, J))
        offset = I
    elif strategy == OverhangStrategy.IGNORE:
        result.append((state, segment_length + J))
        offset = I - J
    else:
        result.append((state, segment_length))
        if I > 0:
            result.append((STATE_DEL, I))
        elif J > 0:
            result.append((STATE_INS, J))
        offset = 0

    cigar = "".join(f"{n_}{s}" for s, n_ in reversed(result) if n_ > 0)
    return cigar, offset


def decode_batch(
    btr: np.ndarray,        # (D, B, R) int16
    ez: dict,               # dict of (B,) arrays from compute_score_max
    tlen: np.ndarray,
    qlen: np.ndarray,
    strategy: OverhangStrategy,
) -> list[tuple[str, int]]:
    out = []
    for b in range(len(tlen)):
        ez_b = {k: v[b] for k, v in ez.items()}
        out.append(
            decode_one(btr[:, b, :], ez_b, int(tlen[b]), int(qlen[b]), strategy)
        )
    return out

"""Minimal BAM reader (BGZF + BAM record parsing), host side.

Enough to consume the reference repo's benchmark fixture
(src/test/resources/HiSeq.1mb.1RG.2k_lines.bam — shipped but unused by any
reference test, SURVEY.md §4) and feed reads into the PairHMM/mapper
pipelines.  BGZF is a sequence of concatenated gzip members, which Python's
gzip module reads natively.
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

_SEQ_NIBBLE = np.frombuffer(b"=ACMGRSVTWYHKDBN", np.uint8)
_CIGAR_OPS = "MIDNSHP=X"


def read_bam(path, max_reads: int | None = None):
    """Parse a BAM file.

    Returns (header: dict, reads: list of dicts with keys
    name/flag/ref_id/pos/mapq/cigar/bases/quals).  ``pos`` is 0-based.
    """
    with gzip.open(path, "rb") as f:
        data = f.read()

    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM file")
    off = 4
    l_text = struct.unpack_from("<i", data, off)[0]
    off += 4
    text = data[off: off + l_text].decode(errors="replace")
    off += l_text
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    refs = []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, off)[0]
        off += 4
        name = data[off: off + l_name - 1].decode()
        off += l_name
        l_ref = struct.unpack_from("<i", data, off)[0]
        off += 4
        refs.append((name, l_ref))

    reads = []
    n = 0
    total = len(data)
    while off + 4 <= total:
        block_size = struct.unpack_from("<i", data, off)[0]
        off += 4
        rec_end = off + block_size
        (ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
         _next_ref, _next_pos, _tlen) = struct.unpack_from(
            "<iiBBHHHiiii", data, off)
        p = off + 32
        name = data[p: p + l_read_name - 1].decode()
        p += l_read_name
        cigar_ops = struct.unpack_from(f"<{n_cigar}I", data, p)
        p += 4 * n_cigar
        cigar = "".join(f"{op >> 4}{_CIGAR_OPS[op & 0xF]}" for op in cigar_ops)
        n_seq_bytes = (l_seq + 1) // 2
        packed = np.frombuffer(data, np.uint8, n_seq_bytes, p)
        p += n_seq_bytes
        nibbles = np.empty(n_seq_bytes * 2, np.uint8)
        nibbles[0::2] = packed >> 4
        nibbles[1::2] = packed & 0xF
        bases = _SEQ_NIBBLE[nibbles[:l_seq]]
        quals = np.frombuffer(data, np.uint8, l_seq, p).copy()
        p += l_seq
        # remaining bytes are optional tags; skipped
        reads.append(dict(name=name, flag=flag, ref_id=ref_id, pos=pos,
                          mapq=mapq, cigar=cigar, bases=bases, quals=quals))
        off = rec_end
        n += 1
        if max_reads is not None and n >= max_reads:
            break

    return {"text": text, "refs": refs}, reads

"""End-to-end align + global coordinate sort (BASELINE.json config 5).

Maps a read batch against a reference (pipelines/mapper.py), builds
64-bit coordinate keys (contig << 48 | position << 16 | tiebreak), and
produces globally ordered output — on one chip via on-device sort, or
across a mesh via the bitonic shard merge (parallel/sort.py).
"""

from __future__ import annotations

import numpy as np

from mgl_tpu.pipelines.mapper import ReferenceIndex, map_reads


def coordinate_keys(contig: np.ndarray, pos: np.ndarray,
                    tiebreak: np.ndarray) -> np.ndarray:
    """(contig, position, tiebreak) -> uint64 sort keys.  Unmapped reads
    (pos < 0) sort to the end (contig 0xFFFF)."""
    c = np.where(pos >= 0, contig.astype(np.uint64), np.uint64(0xFFFF))
    p = np.where(pos >= 0, pos, 0).astype(np.uint64)
    t = tiebreak.astype(np.uint64) & np.uint64(0xFFFF)
    return (c << np.uint64(48)) | (p << np.uint64(16)) | t


def align_and_sort(index: ReferenceIndex, reads: np.ndarray,
                   mesh=None, impl: str = "auto"):
    """Map reads, then emit them in global coordinate order.

    Multi-contig indexes (ReferenceIndex.build_multi) sort by
    (contig, local position); single-contig by position.  Returns dict:
    order (read indices sorted by coordinate), keys (sorted), pos/score
    per read (original order), plus contig/local_pos per read.
    """
    res = map_reads(index, reads, impl=impl)
    n = len(reads)
    # effective alignment start: window start + in-window offset where the
    # exact tier (or CIGAR mode) pinned it; otherwise the window centre
    # (the seed's expected start) as the best estimate
    off = res.get("offset")
    pad = res.get("window_pad", 24)
    eff = np.where(res["pos"] >= 0,
                   res["pos"] + np.where(off >= 0, off, pad),
                   -1)
    contig, local = index.locate(eff)
    res["contig"], res["local_pos"] = contig, local
    keys = coordinate_keys(np.where(contig >= 0, contig, 0),
                           np.where(local >= 0, local, -1),
                           np.arange(n) & 0xFFFF)
    vals = np.arange(n, dtype=np.int32)

    if mesh is not None and int(np.prod(list(mesh.shape.values()))) > 1:
        from mgl_tpu.parallel.sort import sort_records

        skeys, order = sort_records(keys, vals, mesh, "dp")
    else:
        # single device: on-device lexicographic sort of (hi32, lo32)
        # (uint64 would be silently demoted to uint32 without x64 mode)
        from mgl_tpu.parallel.sort import sort_records_single

        skeys, order = sort_records_single(keys, vals)

    out = dict(res)
    out.update({"order": order, "keys": skeys})
    return out

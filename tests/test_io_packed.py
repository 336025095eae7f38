"""Packed wire format, IO readers, metrics, debug-check tests."""

import gzip
import pathlib

import numpy as np
import pytest

from mgl_tpu.batch.packed import (compute_likelihoods_packed, pack_request,
                                  unpack_request)

from conftest import as_u8, kat_read

REF_BAM = pathlib.Path(
    "/root/reference/src/test/resources/HiSeq.1mb.1RG.2k_lines.bam")


def test_pack_unpack_roundtrip(pairhmm_kat):
    reads = [kat_read(c) for c in pairhmm_kat[:4]]
    haps = [as_u8(c["hap"]) for c in pairhmm_kat[:4]]
    lengths, rbuf, hbuf = pack_request(reads, haps)
    # layout: [nReads, len..., nHaps, len...]
    assert lengths[0] == 4 and lengths[5] == 4
    reads2, haps2 = unpack_request(lengths, rbuf, hbuf)
    for a, b in zip(reads, reads2):
        for k in ("bases", "q", "i", "d", "c"):
            assert np.array_equal(a[k], b[k])
    for a, b in zip(haps, haps2):
        assert np.array_equal(a, b)


def test_packed_likelihoods_match_engine(pairhmm_kat):
    cases = pairhmm_kat[:3]
    reads = [kat_read(c) for c in cases]
    haps = [as_u8(c["hap"]) for c in cases]
    lengths, rbuf, hbuf = pack_request(reads, haps)
    flat = compute_likelihoods_packed(lengths, rbuf, hbuf)
    assert flat.shape == (9,)
    for k, c in enumerate(cases):
        assert abs(flat[k * 3 + k] - c["expected_log10"]) < 1e-5


def test_fasta_fastq_roundtrip(tmp_path):
    from mgl_tpu.io import read_fasta, read_fastq

    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 desc\nACGTAC\nGTNN\n>chr2\nTTTT\n")
    seqs = read_fasta(fa)
    assert bytes(seqs["chr1"]) == b"ACGTACGTNN"
    assert bytes(seqs["chr2"]) == b"TTTT"

    fq = tmp_path / "reads.fq.gz"
    with gzip.open(fq, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\n!!!!\n")
    reads = list(read_fastq(fq))
    assert reads[0][0] == "r1" and bytes(reads[0][1]) == b"ACGT"
    assert reads[0][2].tolist() == [40] * 4
    assert reads[1][2].tolist() == [0] * 4


def _write_bam(path, n_records, seq="ACGT" * 30):
    """Minimal BAM writer (gzip container; reader handles BGZF/gzip alike)."""
    import struct

    nib = {c: "=ACMGRSVTWYHKDBN".index(c) for c in "ACGT"}
    body = bytearray()
    text = "@HD\tVN:1.6\n"
    body += b"BAM\x01" + struct.pack("<i", len(text)) + text.encode()
    body += struct.pack("<i", 1)                       # one reference
    body += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 1000)
    l_seq = len(seq)
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = nib[seq[i]]
        lo = nib[seq[i + 1]] if i + 1 < l_seq else 0
        packed.append((hi << 4) | lo)
    for k in range(n_records):
        name = f"read{k}".encode() + b"\x00"
        rec = struct.pack("<iiBBHHHiiii", 0, k % 1000, len(name), 60,
                          0, 1, 0, l_seq, -1, -1, 0)
        rec += name + struct.pack("<I", (l_seq << 4) | 0)   # 120M
        rec += bytes(packed) + bytes([30]) * l_seq
        body += struct.pack("<i", len(rec)) + rec
    with gzip.open(path, "wb") as f:
        f.write(bytes(body))


def test_bam_streaming_past_compaction(tmp_path):
    """Streams a BAM whose decompressed payload exceeds the 1 MB rolling
    buffer chunk, exercising _Stream compaction while record slices from
    earlier takes are still alive (regression: BufferError on del)."""
    from mgl_tpu.io.bam import iter_bam, read_bam

    path = tmp_path / "big.bam"
    n = 12000                      # ~160 B/record ≈ 1.9 MB decompressed
    _write_bam(path, n)
    seen = 0
    last = None
    for hdr, rec in iter_bam(path):
        if hdr is not None:
            assert hdr["refs"] == [("chr1", 1000)]
            continue
        seen += 1
        last = rec
    assert seen == n
    assert last["name"] == f"read{n - 1}"
    assert last["cigar"] == "120M"
    assert bytes(last["bases"]).decode() == "ACGT" * 30
    assert last["quals"].tolist() == [30] * 120
    # read_bam (whole-file path) must also survive compaction
    _, reads = read_bam(path, max_reads=6000)
    assert len(reads) == 6000 and reads[5999]["name"] == "read5999"


@pytest.mark.skipif(not REF_BAM.exists(), reason="reference fixture absent")
def test_bam_reader_fixture():
    from mgl_tpu.io.bam import read_bam

    hdr, reads = read_bam(REF_BAM, max_reads=100)
    assert hdr["refs"][0][0] == "chrM"
    assert len(reads) == 100
    for r in reads[:10]:
        assert len(r["bases"]) == len(r["quals"]) == 101
        assert set(bytes(r["bases"])) <= set(b"ACGTN=")
        assert r["cigar"]


@pytest.mark.skipif(not REF_BAM.exists(), reason="reference fixture absent")
def test_bam_reads_through_pairhmm_engine():
    """Real HiSeq reads through the likelihood engine (fixture the
    reference ships but never exercises, SURVEY.md §4)."""
    from mgl_tpu.api import PairHmmEngine
    from mgl_tpu.io.bam import read_bam

    _, bam = read_bam(REF_BAM, max_reads=4)
    reads = []
    for r in bam:
        n = len(r["bases"])
        reads.append(dict(
            bases=r["bases"], q=np.maximum(r["quals"], 6).astype(np.uint8),
            i=np.full(n, 45, np.uint8), d=np.full(n, 45, np.uint8),
            c=np.full(n, 10, np.uint8)))
    # haplotype = first read's bases (perfect match for read 0)
    out = PairHmmEngine().compute_likelihoods(reads, [bam[0]["bases"]])
    assert out.shape == (4, 1)
    assert out[0, 0] == out[:, 0].max()  # self-match wins
    assert np.all(np.isfinite(out))


def test_metrics_and_debug_check(monkeypatch):
    from mgl_tpu.api import SmithWatermanAligner
    from mgl_tpu.core.params import OverhangStrategy, SWParameters
    from mgl_tpu.utils.metrics import METRICS

    monkeypatch.setenv("MGL_TPU_DEBUG_CHECK", "1")
    METRICS.reset()
    p = SWParameters(25, -50, 110, 6)
    res = SmithWatermanAligner().align_batch(
        [b"ACGTACGTAC"], [b"ACGTACGTAC"], p, OverhangStrategy.SOFTCLIP)
    assert res[0].cigar == "10M"
    snap = METRICS.snapshot()
    assert snap["counters"]["sw.pairs"] == 1
    assert snap["calls"]["sw.align_batch"] == 1


def test_sam_writer_roundtrip(tmp_path):
    """map -> sort -> SAM: header, coordinate order, CIGAR/pos fields."""
    import numpy as np

    from mgl_tpu.io.sam import write_sam
    from mgl_tpu.pipelines.align_sort import align_and_sort
    from mgl_tpu.pipelines.mapper import ReferenceIndex

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(alpha, 50_000)
    idx = ReferenceIndex.build(ref, k=16)
    starts = rng.integers(0, len(ref) - 100, 40)
    reads = ref[starts[:, None] + np.arange(100)[None, :]].copy()
    out = align_and_sort(idx, reads)
    p = tmp_path / "out.sam"
    n = write_sam(p, idx, reads, out)
    lines = p.read_text().splitlines()
    assert lines[0].startswith("@HD") and "SO:coordinate" in lines[0]
    assert lines[1] == f"@SQ\tSN:ref\tLN:{len(ref)}"
    recs = [l.split("\t") for l in lines if not l.startswith("@")]
    assert len(recs) == n == 40
    poss = [int(r[3]) for r in recs if int(r[1]) & 0x4 == 0]
    assert poss == sorted(poss), "records not coordinate-sorted"
    assert all(r[5] == "100M" for r in recs if int(r[1]) & 0x4 == 0)
    assert all(len(r[9]) == 100 for r in recs)


def test_sam_positions_exact_and_contig_boundary(tmp_path):
    """Review regressions: (1) SAM POS must be the true alignment start,
    not the window start; (2) reads near a contig boundary must emit on
    the correct contig with in-range POS."""
    import numpy as np

    from mgl_tpu.io.sam import write_sam
    from mgl_tpu.pipelines.align_sort import align_and_sort
    from mgl_tpu.pipelines.mapper import ReferenceIndex

    rng = np.random.default_rng(5)
    BASES = np.frombuffer(b"ACGT", np.uint8)
    contigs = [("chr1", rng.choice(BASES, 30_000)),
               ("chr2", rng.choice(BASES, 30_000))]
    idx = ReferenceIndex.build_multi(contigs, k=16)
    L = 100
    reads, truth = [], []
    for cid, (_, seq) in enumerate(contigs):
        # include reads at the very start of each contig (clipped windows)
        for st in [0, 1, 5] + list(rng.integers(0, len(seq) - L, 20)):
            reads.append(seq[st: st + L])
            truth.append((cid, int(st)))
    reads = np.stack(reads)
    out = align_and_sort(idx, reads)
    p = tmp_path / "x.sam"
    write_sam(p, idx, reads, out)
    lens = {"chr1": 30_000, "chr2": 30_000}
    by_name = {}
    for line in p.read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        by_name[f[0]] = (f[1], f[2], int(f[3]), f[5])
    n_exact = 0
    for i, (cid, st) in enumerate(truth):
        flag, rname, pos1, cig = by_name[f"read{i}"]
        if int(flag) & 0x4:
            continue
        assert rname == contigs[cid][0], (i, rname, cid)
        assert 1 <= pos1 <= lens[rname], (i, pos1)
        if cig == f"{L}M":           # exact tier pinned the offset
            assert pos1 - 1 == st, (i, pos1 - 1, st)
            n_exact += 1
    assert n_exact >= 0.9 * len(truth), "error-free reads should pin exactly"

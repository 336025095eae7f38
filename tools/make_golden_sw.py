"""Dump SW + PairHMM golden vectors from the compiled C++ reference oracle.

Fills the reference's own SW test-coverage gap (it ships no SW unit tests,
only a differential harness — SURVEY.md §4): we dump (cigar, offset) for
fuzzed pairs across all 4 overhang strategies and several parameter sets,
for both the scalar and AVX2 reference kernels, plus PairHMM scores from
all four reference kernels and the seed-extend fast path.

Usage: tools/oracle/build.sh && python tools/make_golden_sw.py
"""

from __future__ import annotations

import json
import pathlib
import subprocess

import numpy as np

from fuzz_cases import pairhmm_cases, sw_cases

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE = REPO / "tools/oracle/oracle"
GOLDEN = REPO / "tests/golden"

PARAM_SETS = [
    (25, -50, -110, -6),    # STANDARD_NGS (as GATK passes: negative open/ext)
    (200, -150, -260, -11),  # NEW_SW_PARAMETERS
    (3, -1, -4, -3),         # ORIGINAL_DEFAULT
]
STRATEGIES = [1, 2, 4, 8]


def dump_sw() -> None:
    lines = []
    meta = []
    for t, q in sw_cases():
        ts, qs = bytes(t).decode(), bytes(q).decode()
        for pi, (m, x, o, e) in enumerate(PARAM_SETS):
            # vary params per case to keep volume manageable
            if pi > 0 and (len(ts) + len(qs)) % 3 != pi:
                continue
            for s in STRATEGIES:
                lines.append(f"{ts} {qs} {m} {x} {o} {e} {s}")
                meta.append((ts, qs, m, x, o, e, s))
    out = subprocess.run(
        [str(ORACLE), "sw"], input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True,
    )
    rows = []
    for (ts, qs, m, x, o, e, s), line in zip(meta, out.stdout.splitlines()):
        cig_sc, off_sc, cig_avx, off_avx = line.split()
        rows.append({
            "target": ts, "query": qs,
            "match": m, "mismatch": x, "open": o, "ext": e, "strategy": s,
            "cigar_scalar": cig_sc, "offset_scalar": int(off_sc),
            "cigar_avx": cig_avx, "offset_avx": int(off_avx),
        })
    path = GOLDEN / "sw_golden.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    n_avx = sum(1 for r in rows if r["cigar_avx"] != "-")
    n_agree = sum(1 for r in rows if r["cigar_avx"] in ("-", r["cigar_scalar"])
                  and (r["cigar_avx"] == "-" or r["offset_avx"] == r["offset_scalar"]))
    print(f"SW: {len(rows)} cases -> {path}; avx ran on {n_avx}; "
          f"scalar==avx on {n_agree}/{len(rows)}")


def dump_pairhmm() -> None:
    lines = []
    meta = []
    cases = list(pairhmm_cases())
    # also push the KAT inputs through all four kernels
    kat = json.loads((GOLDEN / "pairhmm_kat.json").read_text())
    for c in kat:
        cases.append(dict(
            hap=np.frombuffer(c["hap"].encode(), dtype=np.uint8),
            bases=np.frombuffer(c["read"].encode(), dtype=np.uint8),
            q=np.array(c["q"], dtype=np.uint8), i=np.array(c["i"], dtype=np.uint8),
            d=np.array(c["d"], dtype=np.uint8), c=np.array(c["c"], dtype=np.uint8),
        ))
    for c in cases:
        hap = bytes(c["hap"]).decode()
        rd = bytes(c["bases"]).decode()
        fmt = lambda a: ",".join(str(int(v)) for v in a)
        lines.append(f"{hap} {rd} {fmt(c['q'])} {fmt(c['i'])} {fmt(c['d'])} {fmt(c['c'])}")
        meta.append(c)
    out = subprocess.run(
        [str(ORACLE), "pairhmm"], input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True,
    )
    rows = []
    for c, line in zip(meta, out.stdout.splitlines()):
        sf, sd, af, ad, fast = (float.fromhex(v) for v in line.split())
        rows.append({
            "hap": bytes(c["hap"]).decode(), "read": bytes(c["bases"]).decode(),
            "q": [int(v) for v in c["q"]], "i": [int(v) for v in c["i"]],
            "d": [int(v) for v in c["d"]], "c": [int(v) for v in c["c"]],
            "scalarf": sf.hex(), "scalard": sd.hex(),
            "avxf": af.hex(), "avxd": ad.hex(), "fast": fast.hex(),
        })
    path = GOLDEN / "pairhmm_golden.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in rows))
    print(f"PairHMM: {len(rows)} cases -> {path}")


if __name__ == "__main__":
    dump_sw()
    dump_pairhmm()

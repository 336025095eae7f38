"""Generate the PairHMM known-answer-test (KAT) golden file.

Reads the reference's bundled test vectors
(/root/reference/src/test/resources/pairhmm-testdata.txt, 104 cases) and
re-emits them as JSON under tests/golden/, applying the same qual
normalization the reference's JVM test applies
(MicrosoftPairHmmUnitTest.java:119-129: byte-33, read quals floored at 6).

Run once at build time; the JSON is committed so tests don't depend on the
reference checkout.
"""

from __future__ import annotations

import json
import pathlib

REF = pathlib.Path("/root/reference/src/test/resources/pairhmm-testdata.txt")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden" / "pairhmm_kat.json"


def normalize(s: str, floor: int = 0) -> list[int]:
    return [max(ord(ch) - 33, floor) for ch in s]


def main() -> None:
    cases = []
    for line in REF.read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        hap, rd, rq, iq, dq, gcp, expected = line.split()
        cases.append(
            {
                "hap": hap,
                "read": rd,
                "q": normalize(rq, 6),
                "i": normalize(iq),
                "d": normalize(dq),
                "c": normalize(gcp),
                "expected_log10": float(expected),
            }
        )
    # plus the JVM simpleTest known answer (raw bytes, no normalization;
    # MicrosoftPairHmmUnitTest.java:41-49)
    cases.append(
        {
            "hap": "ACGT",
            "read": "ACGT",
            "q": [43] * 4,
            "i": [43] * 4,
            "d": [43] * 4,
            "c": [43] * 4,
            "expected_log10": -0.6022797,
        }
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(cases))
    print(f"wrote {len(cases)} cases -> {OUT}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Round-end doc-count checker: the registry size quoted in the docs
must equal the actual gate/registry size, derived - never hand
incremented (the r8/r9 verdicts both flagged one-short drift).

Usage:
  sync_counts.py <expected_size>            # check only, exit 1 on drift
  sync_counts.py <expected_size> --fix      # rewrite drifted counts

<expected_size> comes from `sbt "runMain graft.RegistrySize"` or
`len(CORRECTNESS_r*.json)`. The checker scans README.md and
ARCHITECTURE.md for the "N oracle-checked/registry queries" phrasings
and compares N.
"""
import re
import sys
from pathlib import Path

DOCS = ["README.md", "ARCHITECTURE.md"]
# count-bearing phrasings: "<N> oracle-checked", "<N> registry",
# "registry of <N>", "<N>-query", "<N> queries"
PATTERNS = [
    re.compile(r"(\b)(\d{2,4})(\s+(?:oracle-checked|registry)\b)"),
    re.compile(r"(\bregistry of\s+)(\d{2,4})(\b)"),
    re.compile(r"(\b)(\d{2,4})(-query\b)"),
    re.compile(r"(\b)(\d{2,4})(\s+(?:named\s+)?quer(?:y|ies)\b)"),
    re.compile(r"(\bALL\s+)(\d{2,4})(\b)"),
]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    expected = int(sys.argv[1])
    fix = "--fix" in sys.argv[2:]
    root = Path(__file__).resolve().parent.parent
    drift = 0
    for doc in DOCS:
        path = root / doc
        text = path.read_text()
        out = []
        for lineno, line in enumerate(text.splitlines(keepends=True), 1):
            new = line
            for pat in PATTERNS:
                for m in pat.finditer(line):
                    n = int(m.group(2))
                    # only counts in the registry's magnitude range -
                    # years, row counts, etc. stay untouched
                    if 50 <= n <= 2000 and n != expected:
                        drift += 1
                        print(f"{doc}:{lineno}: {n} != {expected}: {line.strip()[:90]}")
                        if fix:
                            new = pat.sub(
                                lambda mm: mm.group(1) + str(expected) + mm.group(3),
                                new)
            out.append(new)
        if fix:
            path.write_text("".join(out))
    if drift and not fix:
        print(f"\n{drift} drifted count(s); re-run with --fix")
        return 1
    if drift and fix:
        print(f"\nrewrote {drift} count(s) to {expected} - REVIEW the diff: "
              "the magnitude filter cannot tell a stale registry count from "
              "an unrelated number in range")
    print("counts consistent" if not drift else "")
    return 0


if __name__ == "__main__":
    sys.exit(main())

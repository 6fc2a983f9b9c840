"""Rewrite COVERAGE.md's gate-status line from a correctness artifact.

The gate line drifted once (round 7 grew the registry mid-round and
the hand-written "176/176" stayed behind), so the count is now EMITTED
from the artifact itself: tools/verify_all.sh calls this right after
writing CORRECTNESS_full_r{N}.json.

Usage: python tools/update_coverage_gate.py CORRECTNESS_full_rNN.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    artifact = sys.argv[1]
    with open(artifact) as f:
        data = json.load(f)
    queries = data.get("queries", data)
    total = len(queries)
    green = sum(
        1
        for q in queries.values()
        if q.get("rows_match") and q.get("schema_match") and q.get("hash_match")
    )
    with open("COVERAGE.md") as f:
        text = f.read()
    new_line = (
        f"**Gate status: {green}/{total} registered queries hash-match their "
        f"DuckDB\noracles at sf0.01 (`{artifact}`, regenerate with\n"
        f"`tools/verify_all.sh` — this paragraph's counts are emitted from "
        f"that artifact\nby `tools/update_coverage_gate.py`, so they cannot "
        f"drift)"
    )
    patched, n = re.subn(
        r"\*\*Gate status: \d+/\d+ registered queries hash-match their "
        r"DuckDB\noracles at sf0\.01 \(`[^`]+`, regenerate with\n"
        r"`tools/verify_all\.sh`(?: — this paragraph's counts are emitted "
        r"from that artifact\nby `tools/update_coverage_gate\.py`, so they "
        r"cannot drift)?\)",
        new_line,
        text,
        count=1,
    )
    if n != 1:
        print(
            f"ERROR: gate-status paragraph not found/ambiguous in COVERAGE.md (matched {n})",
            file=sys.stderr,
        )
        return 1
    with open("COVERAGE.md", "w") as f:
        f.write(patched)
    print(f"COVERAGE.md gate line -> {green}/{total} ({artifact})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

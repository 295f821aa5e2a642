"""SURVEY §2 ↔ registry drift check (VERDICT r10 #3).

Extracts every backticked `id` that appears as the FIRST cell of a §2
table row and diffs it against ``all_queries()``. The blueprint is the
contract future sessions implement from — this must stay empty in both
directions (modulo the documented ``scan_csv`` → ``scan_csv_json``
naming, where the registry id covers both formats).

Usage: python tools/survey_diff.py   (exit 1 on any drift)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Documented naming deltas: SURVEY spelling -> registry spelling.
ALIASES = {"scan_csv": "scan_csv_json", "scan_json": "scan_csv_json"}

# §2 rows whose first cell is a survey-structure label (reference-parity
# matrix rows like "S5 `scan_csv` / `scan_json`"), not a registry id row.


def survey_ids(path: str) -> set[str]:
    ids: set[str] = set()
    in_s2 = False
    for line in open(path, encoding="utf-8"):
        if line.startswith("## "):
            in_s2 = line.startswith("## 2")
        if not in_s2 or not line.startswith("|"):
            continue
        # ids live in the FIRST cell, backticked — either one per
        # backtick pair ("| A2 `agg_basic` |", "| `a` / `b` (r4) |") or
        # slash-compressed inside one pair ("| `tpch_q1/q6` (r9b) |",
        # where later parts reuse the first id's prefix).
        first_cell = line.split("|")[1]
        # "| — `name` ..." marks a protocol component with NO query id
        # (test-only surface, e.g. drop_feature) — not registry drift.
        if first_cell.strip().startswith("—"):
            continue
        for tok in re.findall(r"`([a-z0-9_/]+)`", first_cell):
            parts = tok.split("/")
            head = parts[0]
            if not head:
                continue
            ids.add(ALIASES.get(head, head))
            prefix = head[: head.rfind("_") + 1]
            for p in parts[1:]:
                full = p if "_" in p else prefix + p
                ids.add(ALIASES.get(full, full))
    return ids


def main() -> int:
    from ballista_delta_spark.queries import all_queries

    reg = set(all_queries())
    doc = survey_ids(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md"))
    missing_from_survey = sorted(reg - doc)
    unknown_in_survey = sorted(doc - reg)
    print(f"registry ids: {len(reg)}  survey §2 ids: {len(doc)}")
    if missing_from_survey:
        print("registered but ABSENT from SURVEY §2:", missing_from_survey)
    if unknown_in_survey:
        print("in SURVEY §2 but NOT registered:", unknown_in_survey)
    if missing_from_survey or unknown_in_survey:
        return 1
    print("no drift")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

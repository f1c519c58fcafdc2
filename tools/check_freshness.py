"""Assert the two-round freshness invariant the judge checks: the driver's
50-entry window (the first 50 of __spark_entry__.queries()) UNIONED with the
PREVIOUS round's CORRECTNESS record must cover every registered query, and
every window entry must have an oracle.

A query with NO row in ANY prior CORRECTNESS record is reported separately
as NEW-UNCHECKED (exit 0): it cannot be "stale" — it has never been checked
— but it MUST take a window slot next round, and this tool will flag it as
STALE then (once a round has passed it appears in some prior record or the
uncovered branch fires).

Usage: python tools/check_freshness.py CORRECTNESS_r06.json
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry


def main():
    prev = set(json.load(open(sys.argv[1])))
    ever = set()
    for f in glob.glob(os.path.join(os.path.dirname(sys.argv[1]) or ".",
                                    "CORRECTNESS_r*.json")):
        ever |= set(json.load(open(f)))
    qs = list(entry.queries())
    window = qs[:50]
    oracles = entry.oracle_sql()
    uncovered = [q for q in qs if q not in prev and q not in window]
    stale = [q for q in uncovered if q in ever]
    new_unchecked = [q for q in uncovered if q not in ever]
    no_oracle = [q for q in window if q not in oracles]
    print(f"registered={len(qs)} window={len(window)} prev={len(prev)}")
    if stale:
        print("STALE (checked before, in neither prev record nor window):", stale)
    if new_unchecked:
        print("NEW-UNCHECKED (no driver row yet — MUST be in next round's "
              "window):", new_unchecked)
    if no_oracle:
        print("WINDOW ENTRIES WITHOUT ORACLE:", no_oracle)
    if stale or no_oracle:
        sys.exit(1)
    print("freshness invariant OK" + (
        f" ({len(new_unchecked)} new query awaiting first driver check)"
        if new_unchecked else ""))


if __name__ == "__main__":
    main()

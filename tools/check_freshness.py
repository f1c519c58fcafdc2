"""Assert the two-round freshness invariant the judge checks: the driver's
50-entry window (the first 50 of __spark_entry__.queries()) UNIONED with the
PREVIOUS round's CORRECTNESS record must cover every registered query, and
every window entry must have an oracle.

Usage: python tools/check_freshness.py CORRECTNESS_r06.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry


def main():
    prev = set(json.load(open(sys.argv[1])))
    qs = list(entry.queries())
    window = qs[:50]
    oracles = entry.oracle_sql()
    uncovered = [q for q in qs if q not in prev and q not in window]
    no_oracle = [q for q in window if q not in oracles]
    print(f"registered={len(qs)} window={len(window)} prev={len(prev)}")
    if uncovered:
        print("STALE (in neither prev record nor window):", uncovered)
    if no_oracle:
        print("WINDOW ENTRIES WITHOUT ORACLE:", no_oracle)
    if uncovered or no_oracle:
        sys.exit(1)
    print("freshness invariant OK")


if __name__ == "__main__":
    main()

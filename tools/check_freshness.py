"""Assert the two-round freshness invariant the judge checks: the driver's
50-entry window (the first 50 of __spark_entry__.queries()) UNIONED with the
PREVIOUS round's CORRECTNESS record must cover every registered query, and
every window entry must have an oracle.

A query with NO row in ANY prior CORRECTNESS record is reported as
NEW-UNCHECKED: it cannot be "stale" — it has never been checked — but it
MUST take a window slot next round. That "must" is ENFORCED, not advisory
(ADVICE r7: a never-rotated query would otherwise evade the gate forever,
because it stays NEW-UNCHECKED on every future run too): the first time a
query is seen NEW-UNCHECKED its round is persisted in
``tools/new_unchecked_state.json``; if a LATER round's record still shows it
NEW-UNCHECKED, this tool exits 1. Re-running against the SAME round is
idempotent (no escalation), and a query that finally lands a driver row
drops out of the state file automatically.

Usage: python tools/check_freshness.py CORRECTNESS_r06.json
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry

STATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "new_unchecked_state.json")


def main():
    prev = set(json.load(open(sys.argv[1])))
    ever = set()
    rounds = []
    for f in glob.glob(os.path.join(os.path.dirname(sys.argv[1]) or ".",
                                    "CORRECTNESS_r*.json")):
        ever |= set(json.load(open(f)))
        m = re.search(r"r(\d+)", os.path.basename(f))
        if m:
            rounds.append(int(m.group(1)))
    m = re.search(r"r(\d+)", os.path.basename(sys.argv[1]))
    # the round this check is FOR = the round after the record we were
    # handed (the handed record is "the previous round" of the invariant)
    this_round = (int(m.group(1)) if m else max(rounds, default=0)) + 1
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
    # escalation: NEW-UNCHECKED in two DIFFERENT rounds = the slot promise
    # was broken; the state file makes the first sighting durable
    old_state = {}
    if os.path.exists(STATE):
        old_state = json.load(open(STATE))
    evaded = sorted(q for q in new_unchecked
                    if old_state.get(q, this_round) < this_round)
    new_state = {q: old_state.get(q, this_round) for q in new_unchecked}
    if new_state != old_state:
        with open(STATE, "w") as f:
            json.dump(new_state, f, indent=1, sort_keys=True)
    if evaded:
        print("NEW-UNCHECKED FOR A SECOND ROUND (first flagged for round "
              f"{min(old_state[q] for q in evaded)}; the required window "
              "slot never materialized):", evaded)
    if stale or no_oracle or evaded:
        sys.exit(1)
    print("freshness invariant OK" + (
        f" ({len(new_unchecked)} new query awaiting first driver check)"
        if new_unchecked else ""))


if __name__ == "__main__":
    main()

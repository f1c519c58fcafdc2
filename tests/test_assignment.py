"""One-to-one bipartite matching: hand cases for the mutual-best + round
semantics, and the load-bearing claim of assignment.py — the parallel
locally-dominant-edge fixpoint equals SEQUENTIAL greedy matching under the
(score DESC, left ASC, right ASC) total order — pinned against a
pure-Python greedy model on seeded random graphs."""

import random

from entity_linkings_spark.operators.assignment import one_to_one_match

SCHEMA = "left_id string, right_id string, score double"


def _run(spark, pairs, max_rounds=20):
    df = spark.createDataFrame(pairs, SCHEMA)
    return sorted(
        (r["left_id"], r["right_id"], r["score"], r["round"])
        for r in one_to_one_match(df, max_rounds=max_rounds).collect()
    )


def _greedy(pairs):
    """Sequential greedy matching by (score desc, left asc, right asc)."""
    best = {}
    for l, r, s in pairs:  # collapse duplicate edges to best score
        best[(l, r)] = max(best.get((l, r), s), s)
    order = sorted(best.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    used_l, used_r, out = set(), set(), {}
    for (l, r), s in order:
        if l not in used_l and r not in used_r:
            used_l.add(l)
            used_r.add(r)
            out[(l, r)] = s
    return out


def test_hand_case_rounds(spark):
    # l1 and l2 both prefer rA; l1 wins round 1 (mutual), l2 settles on rB
    # in round 2. l3's only hope rA is taken -> unmatched.
    pairs = [
        ("l1", "rA", 0.9),
        ("l2", "rA", 0.8),
        ("l2", "rB", 0.7),
        ("l3", "rA", 0.5),
    ]
    got = _run(spark, pairs)
    assert got == [("l1", "rA", 0.9, 1), ("l2", "rB", 0.7, 2)]


def test_tie_breaks_to_smallest_partner_id(spark):
    # Equal scores everywhere: left prefers smaller right id, right prefers
    # smaller left id, so (l1, r1) is round-1 dominant; (l2, r2) only becomes
    # dominant once r1/l1 are retired (round 2) — same matching greedy gives.
    pairs = [(l, r, 0.5) for l in ("l1", "l2") for r in ("r1", "r2")]
    got = _run(spark, pairs)
    assert [(g[0], g[1], g[3]) for g in got] == [("l1", "r1", 1), ("l2", "r2", 2)]


def test_duplicate_pair_rows_collapse_to_best_score(spark):
    pairs = [("l1", "rA", 0.2), ("l1", "rA", 0.9), ("l2", "rA", 0.5)]
    got = _run(spark, pairs)
    assert got == [("l1", "rA", 0.9, 1)]


def test_max_rounds_truncates_but_returns_prefix(spark):
    # A chain that needs 3 rounds: capped at 1, only the dominant edge lands.
    pairs = [
        ("l1", "rA", 0.9),
        ("l2", "rA", 0.8),
        ("l2", "rB", 0.7),
        ("l3", "rB", 0.6),
        ("l3", "rC", 0.5),
    ]
    full = _run(spark, pairs)
    assert [(g[0], g[1]) for g in full] == [("l1", "rA"), ("l2", "rB"), ("l3", "rC")]
    assert [g[3] for g in full] == [1, 2, 3]
    capped = _run(spark, pairs, max_rounds=1)
    assert capped == [g for g in full if g[3] <= 1]


def test_empty_input(spark):
    assert _run(spark, []) == []


def test_parity_with_sequential_greedy_on_random_graphs(spark):
    rng = random.Random(71)
    for trial in range(4):
        nl, nr = rng.randint(5, 18), rng.randint(3, 12)
        pairs = []
        for li in range(nl):
            for ri in rng.sample(range(nr), rng.randint(1, min(4, nr))):
                # coarse grid scores force real tie-break decisions
                pairs.append((f"l{li:02d}", f"r{ri:02d}", rng.randint(1, 8) / 8.0))
        got = _run(spark, pairs, max_rounds=50)
        want = _greedy(pairs)
        assert {(l, r): s for l, r, s, _ in got} == want, f"trial {trial}"
        # one-to-one invariant, independent of the model
        lefts = [g[0] for g in got]
        rights = [g[1] for g in got]
        assert len(set(lefts)) == len(lefts) and len(set(rights)) == len(rights)

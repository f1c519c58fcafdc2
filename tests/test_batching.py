"""J10 in-batch candidate construction and F9 multi-choice parsing vs a
direct Python port of the reference logic (chatel/utils.py:12-49)."""

import pyspark.sql.functions as F

from entity_linkings_spark.operators.batching import (
    in_batch_candidates,
    parse_multi_choice,
)


def _ref_parse(resp, cands):
    import re
    L = len(cands)
    if L == 0:
        return -1
    if L == 1:
        return 0
    if "None of the entity match" in resp:
        return -1
    idx = [int(s) - 1 for s in re.findall(r"\b\d+\b", resp) if 0 <= int(s) - 1 < L]
    if len(idx) == 1:
        return idx[0]
    if len(idx) == 2 and L > 2:
        return idx[0]
    contained = []
    for i, c in enumerate(cands):
        if c.lower() in resp.lower():
            ok = True
            for j, o in enumerate(cands):
                if j != i and c in o:
                    ok = False
            if ok:
                contained.append(i)
    return contained[0] if len(contained) == 1 else -1


def test_parse_multi_choice_matches_reference(spark):
    cases = [
        ("The answer is 2.", ["alpha", "beta", "gamma"]),
        ("None of the entity match", ["alpha", "beta"]),
        ("Either 1 or 3", ["alpha", "beta", "gamma"]),
        ("Either 1 or 2", ["alpha", "beta"]),          # two found, n == 2 -> fallthrough
        ("I think it is alpha", ["alpha", "alpha x", "z alpha"]),  # substring-excluded
        ("maybe z alpha", ["alpha", "alpha x", "z alpha"]),        # unique containment
        ("42", ["alpha", "beta", "gamma"]),
        ("1", ["alpha"]),                               # single candidate -> 0
        ("pick BETA please", ["alpha", "beta", "gamma"]),  # case-insensitive containment
        ("no hints at all", ["alpha", "beta"]),
    ]
    df = spark.createDataFrame(cases, "resp string, cands array<string>")
    got = [r["choice"] for r in df.select(parse_multi_choice("resp", "cands").alias("choice")).collect()]
    exp = [_ref_parse(r, c) for r, c in cases]
    assert got == exp


def test_in_batch_candidates_shape(spark):
    rows = spark.createDataFrame(
        [
            (0, 1, "E1", ["N1", "N2", "N3"]),
            (0, 2, "E2", ["N1", "N9"]),
            (1, 3, "E1", []),
        ],
        "batch_id int, row_id int, gold_id string, hard_negatives array<string>",
    )
    out = {r["row_id"]: r for r in in_batch_candidates(rows, k=2).collect()}
    # batch 0: golds {E1,E2} + first-2 negs {N1,N2,N9}, sorted
    assert list(out[1]["candidate_ids"]) == ["E1", "E2", "N1", "N2", "N9"]
    assert out[1]["label"] == 0 and out[2]["label"] == 1
    # batch 1: gold only
    assert list(out[3]["candidate_ids"]) == ["E1"] and out[3]["label"] == 0


def test_pack_sequences_greedy_semantics(spark):
    from entity_linkings_spark.operators.batching import pack_sequences

    chunks = spark.createDataFrame(
        [("s", 0, 0, 100), ("s", 0, 1, 100), ("s", 1, 0, 60), ("s", 1, 1, 100),
         ("s", 2, 0, 300),  # oversized: own bin
         ("s", 3, 0, 10)],
        "source string, doc_id long, chunk_idx int, n_tokens long",
    )
    out = {(r["doc_id"], r["chunk_idx"]): (r["bin_idx"], r["bin_fill"])
           for r in pack_sequences(chunks, capacity=256, group_col="source").collect()}
    assert out[(0, 0)] == (0, 100)
    assert out[(0, 1)] == (0, 200)
    # 200 + 60 = 260 > 256 -> new bin
    assert out[(1, 0)] == (1, 60)
    assert out[(1, 1)] == (1, 160)
    assert out[(2, 0)] == (2, 300)  # oversized chunk occupies its own bin
    assert out[(3, 0)] == (3, 10)   # and never shares it


def test_pack_sequences_groups_independent(spark):
    from entity_linkings_spark.operators.batching import pack_sequences

    chunks = spark.createDataFrame(
        [("a", 0, 0, 200), ("b", 0, 0, 200)],
        "source string, doc_id long, chunk_idx int, n_tokens long",
    )
    out = pack_sequences(chunks, capacity=256, group_col="source").collect()
    assert all(r["bin_idx"] == 0 for r in out)  # bins are per-group

    import pytest
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(chunks, capacity=0)

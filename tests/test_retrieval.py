"""Ranked lexical retrieval (J5): mirrors the reference's bm25_test.py
cardinality contract — len(results) == min(k, |dictionary|) — plus ranking
determinism and zero-fill ordering."""

import pyspark.sql.functions as F

from entity_linkings_spark.operators.retrieval import tfidf_topk


def _ents(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "entity_id int, text string"
    )


def _qs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "query_id int, text string"
    )


def test_cardinality_min_k_dict(spark):
    # |dict| = 8 >= k: every query gets exactly k rows (bm25_test.py:51-57)
    ents = _ents(spark, [f"acme widget {i}" for i in range(8)])
    qs = _qs(spark, ["acme widget", "zzz nothing shared", "widget"])
    out = tfidf_topk(ents, qs, k=5).groupBy("query_id").count().collect()
    assert {r["count"] for r in out} == {5} and len(out) == 3


def test_cardinality_small_dict(spark):
    # |dict| = 3 < k: every query gets |dict| rows (bm25_test.py:58-64)
    ents = _ents(spark, ["alpha beta", "beta gamma", "delta"])
    qs = _qs(spark, ["beta", "nothing"])
    out = tfidf_topk(ents, qs, k=5)
    counts = {r["query_id"]: r["count"] for r in out.groupBy("query_id").count().collect()}
    assert counts == {0: 3, 1: 3}


def test_ranking_prefers_rare_and_matching_tokens(spark):
    ents = _ents(spark, ["red apple", "red banana", "green apple pie", "red red red"])
    qs = _qs(spark, ["apple"])
    rows = tfidf_topk(ents, qs, k=2).orderBy("rank").collect()
    # 'apple' hits entities 0 and 2 with the same tf=1 * same weight -> id tie-break
    assert [r["entity_id"] for r in rows] == [0, 2]
    assert rows[0]["score"] == rows[1]["score"] > 0


def test_zero_fill_is_lowest_missing_ids(spark):
    ents = _ents(spark, ["unique match", "aaa", "bbb", "ccc", "ddd", "eee"])
    qs = _qs(spark, ["unique"])
    rows = tfidf_topk(ents, qs, k=4).orderBy("rank").collect()
    assert rows[0]["entity_id"] == 0 and rows[0]["score"] > 0
    # fill = lowest ids not already present, score 0, ordered by id
    assert [r["entity_id"] for r in rows[1:]] == [1, 2, 3]
    assert all(r["score"] == 0.0 for r in rows[1:])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_max_df_pruning_drops_dense_tokens(spark):
    # 'common' appears in every entity (df=1.0) and must be pruned; 'rare'
    # stays. A query of only-dense tokens degrades to pure zero-fill.
    ents = _ents(spark, ["common rare", "common alpha", "common beta", "common gamma"])
    qs = _qs(spark, ["common rare", "common"])
    out = tfidf_topk(ents, qs, k=2, max_df_frac=0.5)
    rows = {(r["query_id"], r["rank"]): r for r in out.collect()}
    # q0: 'rare' (df=1 <= 2) scores entity 0; 'common' (df=4) contributes 0
    assert rows[(0, 1)]["entity_id"] == 0 and rows[(0, 1)]["score"] > 0
    assert rows[(0, 2)]["score"] == 0.0  # fill
    # q1: all tokens pruned -> both rows are zero-fill by lowest id
    assert [rows[(1, i)]["entity_id"] for i in (1, 2)] == [0, 1]
    assert all(rows[(1, i)]["score"] == 0.0 for i in (1, 2))


def test_gemm_equals_postings_join(spark, tiny):
    """tfidf_topk_gemm is a physical-plan alternative, not a semantic one:
    identical rows (incl. zero-fill ranks and tie-breaks) to tfidf_topk."""
    import pyspark.sql.functions as F

    from entity_linkings_spark.operators.retrieval import tfidf_topk, tfidf_topk_gemm

    ents = tiny["dictionary"].where(F.col("id") != "-1").select(
        F.monotonically_increasing_id().alias("entity_id"), F.col("name").alias("text")
    ).localCheckpoint()
    qs = ents.select(F.col("entity_id").alias("query_id"), "text").limit(40)
    a = sorted(map(tuple, tfidf_topk(ents, qs, k=7).collect()))
    b = sorted(map(tuple, tfidf_topk_gemm(ents, qs, k=7).collect()))
    assert a == b

    with __import__("pytest").raises(ValueError, match="max_cells"):
        tfidf_topk_gemm(ents, qs, k=7, max_cells=1)


def test_auto_dispatch_routes_by_regime(spark):
    """tfidf_topk_auto (VERDICT r3 #4): dense small dictionaries route to
    the GEMM plan (MapInPandas, no window), sparse/over-budget or
    string-keyed ones to the postings join — with identical rows."""
    from entity_linkings_spark.operators.retrieval import tfidf_topk_auto

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # dense: every entity shares the vocabulary -> GEMM
    ents = _ents(spark, [f"acme widget unit{i % 2}" for i in range(8)])
    qs = _qs(spark, ["acme widget", "unit0", "zzz"])
    auto = tfidf_topk_auto(ents, qs, k=3)
    assert "MapInPandas" in plan(auto)
    exp = tfidf_topk(ents, qs, k=3)
    assert {tuple(r) for r in auto.collect()} == {tuple(r) for r in exp.collect()}

    # over-budget matrix -> postings join even though it is dense
    sparse = tfidf_topk_auto(ents, qs, k=3, max_cells=4)
    assert "MapInPandas" not in plan(sparse)
    assert {tuple(r) for r in sparse.collect()} == {tuple(r) for r in exp.collect()}

    # string ids -> postings join (GEMM's integer-id contract)
    sents = spark.createDataFrame(
        [(f"E{i}", "acme widget") for i in range(4)], "entity_id string, text string"
    )
    assert "MapInPandas" not in plan(tfidf_topk_auto(sents, qs, k=2))


def test_gemm_rejects_string_ids(spark):
    import pytest

    from entity_linkings_spark.operators.retrieval import tfidf_topk_gemm

    sents = spark.createDataFrame(
        [("E1", "acme widget")], "entity_id string, text string"
    )
    with pytest.raises(ValueError, match="integer entity ids"):
        tfidf_topk_gemm(sents, _qs(spark, ["acme"]), k=1)

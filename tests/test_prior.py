"""Prior cascade (J3/J4/A1/A2/T1): hand-computed tier aggregates, top-k
normalization over the kept counts (prior/indexer.py:121-126 semantics), and
the reference's k-clamp cardinality floor (bm25_test.py:51-64 analogue)."""

import pyspark.sql.functions as F
import pytest

from entity_linkings_spark.operators.prior import (
    alias_tier_tables,
    best_entity_per_key,
    resolve_by_prior,
    topk_prior,
)


@pytest.fixture()
def counts(spark):
    rows = [
        ("New York", "e1", 10),
        ("new york", "e1", 5),  # collides with above on every tier
        ("NewYork", "e2", 3),   # collides on despace/alnum tiers only
        ("N.Y.", "e1", 2),
        ("ny", "e3", 1),
    ]
    return spark.createDataFrame(rows, "mention string, entity_id string, count long")


def test_tier_merge_sums_counts(counts):
    tiers = alias_tier_tables(counts)
    exact = {(r["key"], r["entity_id"]): r["count"] for r in tiers["exact"].collect()}
    assert exact[("new york", "e1")] == 15  # case collision merged
    despace = {(r["key"], r["entity_id"]): r["count"] for r in tiers["despace"].collect()}
    assert despace[("newyork", "e1")] == 15 and despace[("newyork", "e2")] == 3
    alnum = {(r["key"], r["entity_id"]): r["count"] for r in tiers["alnum"].collect()}
    assert alnum[("ny", "e1")] == 2 and alnum[("ny", "e3")] == 1


def test_best_entity_prior(counts):
    best = {
        r["key"]: (r["entity_id"], r["prior"])
        for r in best_entity_per_key(alias_tier_tables(counts)["despace"]).collect()
    }
    e, p = best["newyork"]
    assert e == "e1" and p == pytest.approx(15 / 18)


def test_topk_normalizes_over_kept(spark):
    rows = [("m", "e1", 6), ("m", "e2", 3), ("m", "e3", 1)]
    c = spark.createDataFrame(rows, "mention string, entity_id string, count long")
    top2 = {r["entity_id"]: (r["rank"], r["score"]) for r in topk_prior(c, 2).collect()}
    assert set(top2) == {"e1", "e2"}  # k-clamp: only 2 kept
    assert top2["e1"] == (1, pytest.approx(6 / 9))  # normalized over kept sum
    assert top2["e2"] == (2, pytest.approx(3 / 9))
    # k larger than candidates -> cardinality = min(k, n) (reference clamp)
    top9 = topk_prior(c, 9).collect()
    assert len(top9) == 3


def test_resolve_cascade_tiers(spark, counts):
    sf = spark.createDataFrame(
        [("new york",), ("n,y,",), ("unknown thing",)], ["surface"]
    ).withColumn("skey", F.md5("surface"))
    out = {r["surface"]: (r["prior_entity"], r["prior_tier"]) for r in resolve_by_prior(sf, counts).collect()}
    assert out["new york"] == ("e1", "exact")
    assert out["n,y,"][0] == "e1" and out["n,y,"][1] == "alnum"  # 'ny' tier-2 hit
    assert out["unknown thing"] == (None, None)

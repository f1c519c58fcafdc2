"""Temporal joins (operators/temporal.py): as-of semantics (backward
inclusive, pre-first-update NULLs, last-write-wins ties) and the bucketed
range join's exactness + plan shape (no nested-loop join)."""

import pyspark.sql.functions as F

from entity_linkings_spark.operators.temporal import asof_join, range_join_buckets


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_backward_inclusive_and_nulls(spark):
    updates = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 20, 2.0), ("u2", 5, 9.0)],
        "user string, ts long, value double",
    )
    probes = spark.createDataFrame(
        [("p1", "u1", 9), ("p2", "u1", 10), ("p3", "u1", 15),
         ("p4", "u1", 25), ("p5", "u2", 4), ("p6", "u3", 99)],
        "pid string, user string, ts long",
    )
    out = {r["pid"]: (r["value_asof"], r["ts_asof"])
           for r in asof_join(probes, updates, on="user").collect()}
    assert out["p1"] == (None, None)        # before any update
    assert out["p2"] == (1.0, 10)           # equal ts is INCLUSIVE
    assert out["p3"] == (1.0, 10)
    assert out["p4"] == (2.0, 20)           # latest wins
    assert out["p5"] == (None, None)
    assert out["p6"] == (None, None)        # key never updated


def test_asof_tie_col_last_write_wins(spark):
    updates = spark.createDataFrame(
        [("u1", 10, 1.0, 1), ("u1", 10, 7.0, 3), ("u1", 10, 4.0, 2)],
        "user string, ts long, value double, seq long",
    )
    probes = spark.createDataFrame([("p1", "u1", 11)], "pid string, user string, ts long")
    row = asof_join(
        probes, updates, on="user", value_cols=["value"], tie_col="seq"
    ).collect()[0]
    assert row["value_asof"] == 7.0  # greatest seq wins among equal-ts updates


def test_asof_plan_one_exchange_no_join(spark):
    updates = spark.createDataFrame([("u1", 1, 1.0)], "user string, ts long, value double")
    probes = spark.createDataFrame([("p", "u1", 2)], "pid string, user string, ts long")
    plan = _plan(asof_join(probes, updates, on="user"))
    # the union-window form: no join operator of any kind in the plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_exact_and_no_nested_loop(spark):
    intervals = spark.createDataFrame(
        [("u1", 0, 100, "a"), ("u1", 150, 160, "b"), ("u2", 50, 250, "c")],
        "user string, start long, end long, iid string",
    )
    events = spark.createDataFrame(
        [(1, "u1", 0), (2, "u1", 100), (3, "u1", 120), (4, "u1", 155),
         (5, "u2", 249), (6, "u2", 251)],
        "eid int, user string, ts long",
    )
    got = {(r["eid"], r["iid"]) for r in range_join_buckets(
        events, intervals, "ts", "start", "end", bucket_width=64, keys=["user"]
    ).collect()}
    # brute-force expectation (boundaries inclusive both ends)
    exp = {(e, i) for e, u, t in [(1, "u1", 0), (2, "u1", 100), (3, "u1", 120),
                                  (4, "u1", 155), (5, "u2", 249), (6, "u2", 251)]
           for iu, s, en, i in [("u1", 0, 100, "a"), ("u1", 150, 160, "b"),
                                ("u2", 50, 250, "c")]
           if u == iu and s <= t <= en}
    assert got == exp and (1, "a") in got and (2, "a") in got
    plan = _plan(range_join_buckets(
        events, intervals, "ts", "start", "end", bucket_width=64, keys=["user"]
    ))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_negative_ts_buckets(spark):
    # floor (not cast-truncate) keeps negative timestamps in the right bucket
    intervals = spark.createDataFrame([(-100, -50, "a")], "start long, end long, iid string")
    events = spark.createDataFrame([(1, -75), (2, -49)], "eid int, ts long")
    got = {(r["eid"], r["iid"]) for r in range_join_buckets(
        events, intervals, "ts", "start", "end", bucket_width=64
    ).collect()}
    assert got == {(1, "a")}

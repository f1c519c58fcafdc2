"""Bucketed co-located joins: both sides bucketed by the join key -> the
physical plan contains NO shuffle Exchange (the at-scale strategy for the
recurring skey joins)."""

import pyspark.sql.functions as F

from entity_linkings_spark.plans.bucketing import read_bucketed, write_bucketed


def test_bucketed_join_is_shuffle_free(spark):
    left = spark.range(0, 2000).select(
        F.md5(F.col("id").cast("string")).alias("skey"),
        (F.col("id") % 7).alias("x"),
    )
    right = spark.range(0, 500).select(
        F.md5(F.col("id").cast("string")).alias("skey"),
        (F.col("id") % 3).alias("y"),
    )
    write_bucketed(left, "t_bleft", "skey", buckets=8)
    write_bucketed(right, "t_bright", "skey", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join shape that would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "t_bleft").join(
            read_bucketed(spark, "t_bright"), "skey"
        )
        assert j.count() == 500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffles
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")

"""Bucketed storage for co-located joins — the pre-shuffle strategy for the
engine's recurring join keys (surface ``skey``, ``conv_id``).

At 100 TB the repeated joins of mention instances <-> surface-keyed results
(resolve, clusters, scores all key by skey) pay a full shuffle of the fact
table each run. Bucketing both sides by the join key at write time makes
every later equi-join shuffle-FREE: Spark matches bucket specs and plans a
SortMergeJoin with zero Exchange on either side (asserted in
tests/test_bucketing.py against the physical plan).

Local note: bucketed tables go through ``saveAsTable`` (the session catalog /
spark-warehouse dir); plain ``parquet(path)`` writes cannot carry bucket
metadata."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 64, sort: bool = True
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) by ``key``: later
    equi-joins between tables sharing (key, buckets) are co-located."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)

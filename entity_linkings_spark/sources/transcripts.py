"""Transcript source — the engine's primary input (BASELINE.json input_hint).

Production posture: an Iceberg table partitioned by ``bucket(N, conv_id)``
(co-locates a conversation's turns; blocking keys shuffle anyway, but the
per-conversation windows in mention extraction then run shuffle-free) and
optionally ``days(ts)`` for retention pruning. In the sandbox we read parquet
with an explicit schema — schemas are always declared, never inferred
(SURVEY.md section 1.2: the F1 contract needs stable types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read a transcript table. ``path`` is a parquet file/dir in the sandbox;
    on a cluster pass an Iceberg identifier (``catalog.db.transcripts``) and
    this becomes ``spark.read.table``."""
    if "/" not in path and "." in path:  # catalog identifier
        return spark.read.table(path)
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)

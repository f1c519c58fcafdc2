"""Mention-counter source (S4): the reference's prior resource is a JSON
dict-of-dicts ``{mention: {entity_name: count}}``
(/root/reference/entity_linkings/candidate_retriever/prior/indexer.py:70,
toy instance assets/mention_counter_toy.json). Here it becomes exploded rows
``(mention, entity_name, count)`` ready for the A1 aggregations — the nested
dict shape does not distribute; the exploded relation does.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALIAS_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("mention", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)


def load_mention_counter_json(spark: SparkSession, path: str) -> DataFrame:
    """Parse a reference-format mention-counter JSON file into exploded rows.
    The file is a single JSON object (dimension-scale resource), parsed on
    the driver and parallelized — mirrors the reference's json.load."""
    with open(path) as f:
        counter = json.load(f)
    rows = [
        (mention, entity, int(cnt))
        for mention, entities in counter.items()
        for entity, cnt in entities.items()
    ]
    return spark.createDataFrame(rows, ALIAS_COUNTS_SCHEMA)


def load_alias_counts(spark: SparkSession, path: str) -> DataFrame:
    """Exploded-form parquet (the engine's native alias_counts table)."""
    return spark.read.schema(ALIAS_COUNTS_SCHEMA).parquet(path)


def from_json_lines(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Distributed variant: one counter JSON object per line (jsonl) —
    from_json into map<string, map<string, long>> then a double explode."""
    parsed = df.select(
        F.from_json(F.col(json_col), "map<string,map<string,bigint>>").alias("m")
    )
    return (
        parsed.select(F.explode("m").alias("mention", "entities"))
        .select("mention", F.explode("entities").alias("entity_id", "count"))
    )

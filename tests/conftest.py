"""Shared fixtures: one session-scoped local Spark session + the tiny
deterministic synthetic dataset (seed=42, datagen.py)."""

from __future__ import annotations

import pytest

from entity_linkings_spark import get_spark
from entity_linkings_spark.datagen import ensure_dataset


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="el-spark-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_paths():
    return ensure_dataset("tiny")


@pytest.fixture(scope="session")
def tiny(spark, tiny_paths):
    from entity_linkings_spark.sources.dictionary import load_dictionary
    from entity_linkings_spark.sources.transcripts import load_transcripts

    return {
        "transcripts": load_transcripts(spark, tiny_paths["transcripts"]),
        "dictionary": load_dictionary(spark, tiny_paths["entity_dictionary"]),
        "gold": spark.read.parquet(tiny_paths["gold_mentions"]),
        "alias_counts": spark.read.parquet(tiny_paths["alias_counts"]),
    }

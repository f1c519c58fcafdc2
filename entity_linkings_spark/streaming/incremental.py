"""Incremental linkage over a transcript stream.

Design:
  * Source: ``readStream`` over a growing directory of transcript parquet
    (on a cluster: Kafka/Iceberg-CDC; the file source keeps the sandbox
    self-contained).
  * Mention extraction + resolution run per micro-batch via ``foreachBatch``:
    the extractor's gaps-and-islands windows are batch-only constructs, and
    a micro-batch is exactly a bounded batch — the standard pattern for
    reusing batch operators in streams. Each micro-batch *dynamically
    overwrites its own epoch_id partition* of the sink — the standard
    foreachBatch idempotence pattern: a replayed epoch (failure after write,
    before checkpoint commit) rewrites the same partition instead of
    appending duplicates.
  * Pure-streaming path: ``windowed_mention_counts`` — watermarked event-time
    windows over the mention stream (counts per entity per hour), late data
    bounded by the watermark. This is the aggregation that survives at
    10^12-turn scale because state is bounded by (watermark x entities).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_linkings_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, path: str, max_files: int = 10) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def batch_processor(pipeline, sink_path: str):
    """The foreachBatch function: extract -> surfaces -> resolve -> write the
    epoch's partition. Exposed standalone so tests can replay an epoch and
    assert idempotence."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        mentions = pipeline.mentions(batch).cache()
        surfaces = pipeline.surfaces(mentions)
        resolved = pipeline.resolve(surfaces)
        out = (
            pipeline.mention_clusters(mentions, _trivial_clusters(surfaces))
            .join(resolved.select("skey", "entity_id", "score"), "skey", "left")
            .select(
                "conv_id", "turn_idx", "start", "end", "mention",
                "mention_id", "entity_id", "score",
            )
            .withColumn("epoch_id", F.lit(epoch_id))
        )
        # idempotent per epoch: dynamic partition overwrite replaces exactly
        # the partitions present in this batch (= this epoch_id) on replay
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(sink_path)
        )
        mentions.unpersist()

    return process


def incremental_linkage(
    stream: DataFrame,
    pipeline,
    sink_path: str,
    checkpoint_path: str,
):
    """foreachBatch micro-batch linkage. Returns the StreamingQuery builder
    (caller starts/awaits)."""
    return (
        stream.writeStream.foreachBatch(batch_processor(pipeline, sink_path))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )


def _trivial_clusters(surfaces: DataFrame) -> DataFrame:
    """Within a micro-batch, clusters are per-surface (cross-batch clustering
    belongs to the periodic batch job; streams only resolve + accumulate)."""
    return surfaces.select(F.col("skey").alias("node"), F.col("skey").alias("cluster_id"))


def windowed_mention_counts(
    stream: DataFrame,
    extract: Callable[[DataFrame], DataFrame] | None,
    dict_tokens: list[str],
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked event-time windowed counts of anchor tokens per window —
    a pure streaming aggregation (no foreachBatch): tokens are exploded with
    Catalyst expressions only, so this plan runs under the streaming
    micro-batch engine with bounded state.

    Returns a streaming DataFrame (window struct, token, n) for any sink.
    """
    toks = stream.withWatermark("ts", watermark).select(
        "ts",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower("text"), F.lit(r"[\w#]+"), 0)
            )
        ).alias("token"),
    )
    anchors = toks.where(F.col("token").isin(dict_tokens))
    return anchors.groupBy(F.window("ts", window).alias("window"), "token").agg(
        F.count("*").alias("n")
    )

"""Temporal joins Spark's DataFrame API lacks, built from one-shuffle
compositions (no per-row Python, no driver loops).

  * asof_join — each probe row picks the LATEST update row with
    update_ts <= probe_ts for the same key (the classic point-in-time /
    "merge_asof" lookup: resolving a mention against the alias-prior
    snapshot that was current when the turn happened). Spark has no ASOF
    JOIN; a naive range join explodes to (probe x update) pairs per key and
    then argmaxes. This implementation is the scalable union form:
    tag updates and probes, union them, ONE shuffle on the key, and carry
    the last non-null update payload forward with last(ignorenulls) over
    an ordered window — cost = sort within key partitions, the same work a
    merge-based ASOF join does, with no pair blow-up at any scale.
  * range_join_buckets — interval containment (event ts inside
    [start, end]) as an equi-join on fixed-width time buckets instead of a
    pure inequality join (which Spark plans as BroadcastNestedLoop): each
    interval lands in every bucket it overlaps, events probe their single
    bucket, and an exact range filter cleans up — candidates are bounded by
    bucket co-residency, never |events| x |intervals|.

The reference has no temporal operators (its corpora are static dumps);
these extend the engine for the transcript-stream setting the north rule
targets, where dictionaries/priors are themselves snapshot streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    updates: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward inclusive as-of join: every probe row gains
    ``<value><suffix>`` columns from the latest update row (same key,
    update ts <= probe ts); probes before any update get NULLs.

    ``tie_col``: deterministic winner among updates sharing an exact
    (key, ts) — the one with the GREATEST tie_col value wins (matches a
    last-write-wins snapshot stream). Required for engine-independent
    results when equal-timestamp updates are possible.

    Plan: one Exchange on ``on`` + one in-partition sort — the union-window
    form of ASOF (DuckDB/QuestDB plan the same shape natively). No
    inequality join, so no BroadcastNestedLoopJoin at any input size.
    """
    key = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in updates.columns if c not in key and c != ts_col]

    payload = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(ts_col).alias("__uts"),
    )
    u = updates
    if tie_col is not None:
        # collapse equal-(key, ts) updates to the last-write winner BEFORE
        # the union: one extra in-partition window over the update side only
        wt = Window.partitionBy(*key, ts_col).orderBy(F.desc(tie_col))
        u = u.withColumn("__rn", F.row_number().over(wt)).where(F.col("__rn") == 1)
    probe_cols = probes.columns
    probe_payload = F.struct(*[F.col(c).alias(c) for c in probe_cols])
    u_tagged = u.select(
        *key,
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),  # updates sort BEFORE probes at equal ts
        payload.alias("__v"),
        F.lit(None).cast(
            probes.select(probe_payload.alias("__p")).schema["__p"].dataType
        ).alias("__p"),
    )
    p_tagged = probes.select(
        *key,
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(u_tagged.schema["__v"].dataType).alias("__v"),
        probe_payload.alias("__p"),
    )
    w = (
        Window.partitionBy(*key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # probe rows carry their full payload through the union, so no join-back
    # (and no nondeterministic row-id) is needed to reattach them
    return (
        u_tagged.unionByName(p_tagged)
        .withColumn("__carry", F.last("__v", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
        .select(
            *[F.col(f"__p.{c}").alias(c) for c in probe_cols],
            *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in value_cols],
            F.col("__carry.__uts").alias(f"{ts_col}{suffix}"),
        )
    )


def range_join_buckets(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Containment range join (start <= event_ts <= end, optionally also
    matching equi-``keys``) as a bucketed equi-join: intervals explode to
    their overlapped buckets via ``sequence()`` (bounded by interval length
    / bucket_width), events map to ONE bucket, the join runs on
    (keys..., bucket), and the exact range predicate filters the
    co-resident candidates. Pick ``bucket_width`` near the typical interval
    length: fan-out stays O(1) per interval, candidates are bounded by
    bucket co-residency, and no BroadcastNestedLoopJoin ever appears in the
    plan — which is what Spark gives a raw inequality join."""
    join_keys = list(keys or []) + ["__bucket"]
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor(F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    ev = events.withColumn(
        "__bucket", F.floor(F.col(event_ts) / bucket_width).cast("long")
    )
    joined = ev.join(iv, join_keys).where(
        F.col(event_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bucket")

"""Golden-record survivorship: one canonical row per resolved cluster.

The reference resolves mentions to entity ids and stops there
(/root/reference/entity_linkings/pipeline.py:48 — argmax per mention);
production entity resolution needs the next step the north rule's
"resolved entity table" implies: collapsing each cluster's member records
into ONE canonical ("golden") record under explicit survivorship rules —
the Splink/JedAI golden-record stage. Every rule here is a deterministic
pure aggregate, so the output is bit-identical across reruns and
partitionings, and an SQL oracle can restate it.

Scale shape: the non-mode rules are ONE hash aggregate over the labeled
records (map-side partials, no window, no sort); each ``mode`` field adds
one (cluster, value) counting aggregate plus a cluster-keyed reduction of
that bounded table. Nothing is collected; no row ever carries more than
its own cluster's winner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule name -> needs order_col
RULES = {"mode", "longest", "max", "min", "newest"}


def _ordered_pick(value: Column, order: Column) -> Column:
    """max over struct(order, value): the winner is the row with the
    greatest ``order``, ties broken to the GREATEST value under Spark's
    lexicographic struct comparison (mirrored exactly by DuckDB struct
    max). Null values never win: the whole struct is nulled so the
    aggregate skips it (an all-null field yields null)."""
    return F.max(
        F.when(value.isNotNull(), F.struct(order.alias("o"), value.alias("v")))
    )["v"]


def golden_records(
    labels: DataFrame,
    records: DataFrame,
    rules: dict[str, str],
    key: str = "node",
    order_col: str | None = None,
) -> DataFrame:
    """One canonical row per cluster: (cluster_id, n_records, <field> per
    rule). ``labels`` is (node, cluster_id); ``records`` carries ``key``
    plus the fields named in ``rules``. A record whose key has no label
    counts as a singleton cluster of itself (the clustering-consumer
    convention shared with bcubed_table / clustering_agreement).

    Rules (all deterministic, nulls never win, all-null fields yield
    null):

    - ``mode``     most frequent value; ties -> greatest value
    - ``longest``  greatest character length; ties -> greatest value
    - ``max`` / ``min``  plain extrema (null-skipping)
    - ``newest``   value on the row with the greatest ``order_col``
                   (required argument); ties -> greatest value
    """
    unknown = {f: r for f, r in rules.items() if r not in RULES}
    if unknown:
        raise ValueError(f"unknown survivorship rules: {unknown}")
    if "newest" in rules.values() and order_col is None:
        raise ValueError("rule 'newest' requires order_col")

    base = records.join(
        labels.withColumnsRenamed({"node": key}), key, "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(key)))

    aggs = [F.count("*").alias("n_records")]
    mode_fields = []
    for field, rule in rules.items():
        c = F.col(field)
        if rule == "mode":
            mode_fields.append(field)
        elif rule == "longest":
            aggs.append(_ordered_pick(c, F.length(c)).alias(field))
        elif rule == "max":
            aggs.append(F.max(c).alias(field))
        elif rule == "min":
            aggs.append(F.min(c).alias(field))
        elif rule == "newest":
            aggs.append(_ordered_pick(c, F.col(order_col)).alias(field))
    out = base.groupBy("cluster_id").agg(*aggs)

    for field in mode_fields:
        counts = (
            base.where(F.col(field).isNotNull())
            .groupBy("cluster_id", field)
            .agg(F.count("*").alias("_n"))
        )
        winner = counts.groupBy("cluster_id").agg(
            _ordered_pick(F.col(field), F.col("_n")).alias(field)
        )
        # left join: an all-null mode field must yield a null column, not
        # drop the cluster row
        out = out.join(winner, "cluster_id", "left")

    ordered = ["cluster_id", "n_records", *rules]
    return out.select(*ordered)

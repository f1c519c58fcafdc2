"""Candidate-pair generation: token blocking + MinHash-LSH banding.

Replaces the reference's index probes — BM25 top-k
(/root/reference/entity_linkings/candidate_retriever/bm25/indexer.py:85-114)
and FAISS dense top-k (candidate_retriever/dualencoder/indexer.py:94-132) —
with *blocking joins* that produce candidate pairs directly (SURVEY.md J5/J6).

Scale design (10^12 turns):
  * Blocking operates on **distinct normalized surfaces**, not mention
    instances — identical strings are trivially the same entity, so the pair
    space shrinks from O(instances^2) to O(distinct^2) long before any join.
  * Block-size cap: token blocks have power-law sizes; blocks larger than
    ``max_block_size`` are dropped (standard token-blocking practice — their
    tokens are stopword-like and carry no discriminative signal). Dropped
    blocks are observable via ``block_stats``, never silent.
  * Skew: the self-join shuffles by block key; AQE skew-join splitting
    (enabled in session.py) handles residual hot keys under the cap. For
    extreme dictionaries, an explicit triangle-salted self-join can be slotted
    in here without touching callers (pairs schema is the contract).
  * Pair dedup: canonical ``skey_a < skey_b`` ordering (SURVEY.md section 4
    item 2) and a groupBy that keeps the first block key per pair — one
    shuffle, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_linkings_spark.functions.hashing import minhash_signature
from entity_linkings_spark.functions.strings import char_ngrams, norm_exact, tokenize


def distinct_surfaces(mentions: DataFrame) -> DataFrame:
    """Collapse mention instances to distinct normalized surfaces.

    Returns (skey, surface, n_instances): ``surface`` is the lowercased
    trimmed form (scoring operates on it), ``skey`` = md5(surface) is the
    stable join key back to instances.
    """
    return (
        mentions.select(norm_exact("mention").alias("surface"))
        .groupBy("surface")
        .agg(F.count("*").alias("n_instances"))
        .withColumn("skey", F.md5("surface"))
    )


def attach_skey(mentions: DataFrame) -> DataFrame:
    """Add the surface key to a mention-instance DataFrame (no shuffle)."""
    return mentions.withColumn("skey", F.md5(norm_exact("mention")))


def token_block_keys(surfaces: DataFrame, min_token_len: int = 2) -> DataFrame:
    """(skey, surface, block_key) — one row per (surface, distinct token)."""
    return (
        surfaces.select(
            "skey",
            "surface",
            F.explode(F.array_distinct(tokenize("surface"))).alias("block_key"),
        )
        .where(F.length("block_key") >= min_token_len)
        .withColumn("block_key", F.concat(F.lit("tok:"), F.col("block_key")))
    )


def lsh_block_keys(
    surfaces: DataFrame,
    num_bands: int = 8,
    rows_per_band: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """(skey, surface, block_key) via MinHash-LSH banding over character
    n-gram shingles: b bands x r rows; two surfaces share a band key with
    probability 1-(1-s^r)^b for Jaccard similarity s.

    Pure Catalyst (functions/hashing.py minhash) — no UDF, no ML pipeline;
    banding keys are md5 of the band's row slice, salted with the band index.
    """
    sig = minhash_signature(char_ngrams(norm_exact("surface"), ngram), num_bands * rows_per_band)
    bands = F.array(
        *[
            F.concat(
                F.lit(f"mh{b}:"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ),
            )
            for b in range(num_bands)
        ]
    )
    return (
        surfaces.withColumn("sig", sig)
        .select("skey", "surface", F.explode(bands).alias("block_key"))
    )


def cap_blocks(keys: DataFrame, max_block_size: int) -> DataFrame:
    """Drop blocks with fewer than 2 or more than ``max_block_size`` members.
    One shuffle (window count over block_key); hot stopword-like blocks die
    here, which is also the skew guard for the pair join."""
    w = Window.partitionBy("block_key")
    return (
        keys.withColumn("bsize", F.count("*").over(w))
        .where((F.col("bsize") >= 2) & (F.col("bsize") <= max_block_size))
        .drop("bsize")
    )


def block_stats(keys: DataFrame) -> DataFrame:
    """Block-size histogram (observability for the cap; A6-style aggregate)."""
    return (
        keys.groupBy("block_key")
        .agg(F.count("*").alias("block_size"))
        .groupBy("block_size")
        .agg(F.count("*").alias("n_blocks"))
        .orderBy("block_size")
    )


def candidate_pairs(keys: DataFrame) -> DataFrame:
    """Self-join within block keys -> canonical deduped pairs.

    Output: (skey_a, skey_b, surface_a, surface_b, block_key) with
    skey_a < skey_b and one row per pair (first block key wins,
    deterministically = min). AQE splits skewed block partitions at runtime.
    """
    a = keys.select(
        F.col("block_key"),
        F.col("skey").alias("skey_a"),
        F.col("surface").alias("surface_a"),
    )
    b = keys.select(
        F.col("block_key"),
        F.col("skey").alias("skey_b"),
        F.col("surface").alias("surface_b"),
    )
    pairs = a.join(b, "block_key").where(F.col("skey_a") < F.col("skey_b"))
    return pairs.groupBy("skey_a", "skey_b").agg(
        F.min("block_key").alias("block_key"),
        F.first("surface_a").alias("surface_a"),
        F.first("surface_b").alias("surface_b"),
    )


def blocking_pairs(
    surfaces: DataFrame,
    max_block_size: int = 1000,
    use_tokens: bool = True,
    use_lsh: bool = True,
    num_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Full blocking stage: union of token and LSH band keys, capped, paired."""
    parts = []
    if use_tokens:
        parts.append(token_block_keys(surfaces))
    if use_lsh:
        parts.append(lsh_block_keys(surfaces, num_bands, rows_per_band))
    keys = parts[0]
    for p in parts[1:]:
        keys = keys.unionByName(p)
    return candidate_pairs(cap_blocks(keys, max_block_size))

"""Deterministic, engine-portable hashing.

Every hash is derived from md5(string) hex digits so the exact same values are
computable in Spark SQL, DuckDB, and plain Python — the driver's DuckDB oracle
and our resume logic both depend on that determinism (no rand(), no
monotonically_increasing_id() in any keyed path).

Replaces the reference's index artifacts: md5 prompt keys
(/root/reference/entity_linkings/candidate_reranker/chatel/utils.py:73-75),
FAISS dense indexes (candidate_retriever/dualencoder/indexer.py:22-157 — here
MinHash-LSH banding), and BM25 token stats (candidate_retriever/bm25/indexer.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Largest prime below 2**28; minhash values live in [0, MINHASH_PRIME).
# h1 + i*h2 stays far below 2**63 for any sane i, so the double-hashing
# (Kirsch–Mitzenmacher) combination never overflows a BIGINT in either engine.
MINHASH_PRIME = 268435399

SIMHASH_BITS = 60  # 15 hex digits of md5 -> fits a signed 64-bit int


def h60(col: Column | str) -> Column:
    """60-bit non-negative hash: first 15 hex digits of md5.

    DuckDB equivalent: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h28(col: Column | str, salt: str = "") -> Column:
    """28-bit hash: first 7 hex digits of md5(salt || s). Used as the base
    hashes for minhash double-hashing."""
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def minhash_signature(tokens_col: Column | str, num_hashes: int) -> Column:
    """MinHash signature (array<long> of length ``num_hashes``) over a set of
    string tokens, as a pure Catalyst expression — no UDF, no shuffle.

    h_i(t) = (h1(t) + i * h2(t)) mod MINHASH_PRIME   (double hashing),
    sig[i] = min over tokens. Empty token arrays yield MINHASH_PRIME (sentinel)
    so empty docs never collide with real signatures beyond chance.

    Replaces the dense ANN probe of the reference
    (candidate_retriever/dualencoder/indexer.py:94-132) with set-similarity
    banding; tuning is bands x rows instead of HNSW ef/M.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    h1 = F.transform(toks, lambda t: h28(t, "mh1:"))
    h2 = F.transform(toks, lambda t: h28(t, "mh2:"))
    sigs = [
        F.coalesce(
            F.array_min(
                F.zip_with(
                    h1,
                    h2,
                    lambda a, b: (a + F.lit(i) * b) % F.lit(MINHASH_PRIME),
                )
            ),
            F.lit(MINHASH_PRIME),
        )
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def simhash64(tokens_col: Column | str) -> Column:
    """SimHash over token h60 hashes: bit j of the result is 1 iff more token
    hashes have bit j set than unset. Pure Catalyst expression.

    For each bit j we sum (+1/-1) votes across tokens via aggregate(); ties
    (sum == 0) resolve to 0. Empty token arrays hash to 0.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    hashes = F.transform(toks, lambda t: h60(t))
    out = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        out = out + F.when(vote > 0, F.lit(1).cast("long") * (2**j)).otherwise(F.lit(0))
    return out

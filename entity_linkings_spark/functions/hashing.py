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
    sig[i] = min over tokens. Empty token arrays yield NULL (not a sentinel
    signature): a shared sentinel would make every empty doc collide with
    every other in every LSH band — a quadratic hot block on empty-heavy
    corpora. Callers must propagate the NULL into NULL band keys, which
    equi-joins drop naturally.

    Single-pass formulation: the two base md5 hashes are materialized once per
    token in an inner transform() and the signature is folded in ONE
    aggregate() whose accumulator is the K-wide min array. (The naive
    "array of K array_min expressions" form recomputes the md5s K times —
    Catalyst does not share subexpressions across array elements in
    higher-order functions; measured ~20x slower.)

    Replaces the dense ANN probe of the reference
    (candidate_retriever/dualencoder/indexer.py:94-132) with set-similarity
    banding; tuning is bands x rows instead of HNSW ef/M.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    hashes = F.transform(
        toks, lambda t: F.struct(h28(t, "mh1:").alias("h1"), h28(t, "mh2:").alias("h2"))
    )
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    sig = F.aggregate(
        hashes,
        init,
        lambda acc, s: F.transform(
            acc,
            lambda v, i: F.least(
                v, (s["h1"] + i.cast("long") * s["h2"]) % F.lit(MINHASH_PRIME)
            ),
        ),
    )
    return F.when(F.size(toks) > 0, sig)


def simhash64(tokens_col: Column | str) -> Column:
    """SimHash over token h60 hashes: bit j of the result is 1 iff more token
    hashes have bit j set than unset. Pure Catalyst expression.

    Single pass: one aggregate() folds every token's md5-derived hash into a
    60-wide vote array (+1/-1 per bit), then one reduction turns positive
    votes into bits. (60 independent per-bit aggregates would recompute the
    md5 per bit — same Catalyst-CSE pitfall as minhash_signature.)
    Ties (vote sum == 0) resolve to 0; empty token arrays hash to 0.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    hashes = F.transform(toks, lambda t: h60(t))

    # shiftleft/shiftright need Python-int shift amounts, but the bit index
    # here is a lambda variable — use 2^j masks instead (powers of two are
    # exact in double up to 2^62, so the cast round-trips exactly)
    def mask(j):
        return F.pow(F.lit(2.0), j.cast("double")).cast("long")

    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.transform(
            acc,
            lambda v, j: v
            + F.when(h.bitwiseAND(mask(j)) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda v, j: F.when(v > 0, mask(j)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

"""Scalar column functions (SURVEY.md section 2.7) — all JVM-side Catalyst
expressions, chosen for bit-identical parity with DuckDB so the driver's
oracle can verify them. No Python UDFs live here."""

from entity_linkings_spark.functions.hashing import (
    MINHASH_PRIME,
    h28,
    h60,
    minhash_signature,
    simhash64,
)
from entity_linkings_spark.functions.strings import (
    char_ngrams,
    mention_substring,
    norm_alnum,
    norm_despace,
    norm_exact,
    norm_title,
    tokenize,
)

__all__ = [
    "MINHASH_PRIME",
    "h28",
    "h60",
    "minhash_signature",
    "simhash64",
    "char_ngrams",
    "mention_substring",
    "norm_alnum",
    "norm_despace",
    "norm_exact",
    "norm_title",
    "tokenize",
]

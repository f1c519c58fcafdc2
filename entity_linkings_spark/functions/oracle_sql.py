"""Reusable DuckDB SQL fragments for driver oracles.

These are NOT execution paths of the engine — they exist so the driver can
replay engine semantics independently in DuckDB (the correctness gate). Kept
next to the engine code so every Spark change updates its oracle twin.
"""

from __future__ import annotations

# OSA (optimal string alignment / restricted Damerau) as a recursive-CTE DP:
# DuckDB's damerau_levenshtein is the FULL DL (adjacent transposition with
# intervening edits, e.g. 'ca'->'abc' = 2), while the scorer implements OSA
# ('ca'->'abc' = 3), so oracles replay the exact DP. Row i of the DP is a
# list; the insertion dependency inside a row is resolved with the same
# prefix-scan identity the numpy scorer uses: dp[j] = j + min over k<=j of
# (pre[k] - k). Fuzz-verified against a reference OSA on 3000 random pairs.


def osa_dp_sql(src: str, prefix: str = "osa") -> str:
    """Recursive CTE block computing (pair_id, osa_dist) from a CTE/subquery
    ``src`` with columns (pair_id, a, b). Must be placed inside a
    WITH RECURSIVE list; emits CTEs ``{prefix}_base/_dp/_out``."""
    p = prefix
    return f"""
    {p}_base AS MATERIALIZED (SELECT pair_id, string_split(a, '') AS ac, string_split(b, '') AS bc,
                        length(a) AS la, length(b) AS lb FROM {src}),
    {p}_dp AS (
        SELECT pair_id, ac, bc, la, lb, 0 AS i,
               list_transform(generate_series(0, lb), x -> CAST(x AS BIGINT)) AS cur,
               CAST(NULL AS BIGINT[]) AS prev
        FROM {p}_base
        UNION ALL
        SELECT pair_id, ac, bc, la, lb, i + 1,
               list_prepend(CAST(i + 1 AS BIGINT),
                 list_transform(generate_series(1, lb), j ->
                   j + least(CAST(i + 1 AS BIGINT), list_min(pmsrc[1:j])))) AS cur,
               cur AS prev
        FROM (
          SELECT *, list_transform(pre_l, (x, k) -> x - k) AS pmsrc
          FROM (
            SELECT *, list_transform(generate_series(1, lb), j ->
                 least(cur[j+1] + 1,
                       cur[j] + CASE WHEN ac[i+1] = bc[j] THEN 0 ELSE 1 END,
                       CASE WHEN i >= 1 AND j >= 2 AND ac[i+1] = bc[j-1] AND ac[i] = bc[j]
                            THEN prev[j-1] + 1 ELSE 999999 END)) AS pre_l
            FROM {p}_dp WHERE i < la))
    ),
    {p}_out AS MATERIALIZED (SELECT pair_id, cur[lb+1] AS osa_dist FROM {p}_dp WHERE i = la)
"""


# deduped 3-gram set of a string column, mirroring the scorer's _ngram_codes:
# empty -> no grams; len < 3 -> the whole string as one gram; else sliding
# 3-grams, deduped
def grams3_sql(s: str) -> str:
    return (
        f"CASE WHEN length({s}) = 0 THEN [] "
        f"WHEN length({s}) < 3 THEN [{s}] "
        f"ELSE list_distinct(list_transform(generate_series(1, length({s}) - 2), "
        f"i -> substr({s}, i, 3))) END"
    )


# the scorer's blended score with W = (jw .35, osa .45, cos 0, jac .20):
# the 0-weight cosine term is omitted because x + 0.0*cos == x exactly for
# any finite cos (same arithmetic tree as the numpy kernel)
def combined_sql(a: str, b: str, osa_dist: str) -> str:
    ml = f"greatest(length({a}), length({b}), 1)"
    ga, gb = grams3_sql(a), grams3_sql(b)
    inter = f"len(list_intersect({ga}, {gb}))"
    union = f"(len({ga}) + len({gb}) - {inter})"
    jac = f"CASE WHEN {union} > 0 THEN {inter}::DOUBLE / {union} ELSE 0.0 END"
    return (
        f"0.35 * jaro_winkler_similarity({a}, {b}) "
        f"+ 0.45 * (1.0 - {osa_dist} / {ml}) "
        f"+ 0.2 * ({jac})"
    )

"""Context-window projections and span marking (SURVEY.md P4-P7, F12) —
the reference's preprocessing surface as Catalyst expressions.

Reference provenance (/root/reference/entity_linkings/):
  * P4 cut_context_window — data_utils/utils.py:28-43: char window of size W
    centered on the mention, offsets re-based.
  * P5 truncate_around_mention — data_utils/utils.py:46-80: token-id window
    of max length keeping the mention centered (array slice here).
  * P6 span marking — data_utils/preprocessor.py:79-91 /
    dualencoder/preprocessor.py:21-24: [START_ENT]/[END_ENT] inserted around
    the span (kept as an optional debug column; string-similarity scoring
    does not need it).
  * P7 marker parsing — cli/run_pipeline.py:50-56: inverse of P6, parse
    ``[[mention]]`` markers out of raw text into spans + cleaned text.
  * F12 span-probability combination — candidate_reranker/extend/utils.py:
    25-75: combine per-position start/end probabilities (max-prod semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

START_TAG = "[START_ENT]"
END_TAG = "[END_ENT]"


def cut_context_window(
    text: Column | str, start: Column | str, end: Column | str, window: int = 64
) -> Column:
    """struct(context, new_start, new_end): a ~``window``-char slice centered
    on the span with offsets re-based into the slice (P4 semantics)."""
    t = F.col(text) if isinstance(text, str) else text
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    half = F.lit(window // 2)
    lo = F.greatest(s - half, F.lit(0))
    hi = F.least(e + half, F.length(t))
    return F.struct(
        t.substr(lo + 1, hi - lo).alias("context"),
        (s - lo).alias("new_start"),
        (e - lo).alias("new_end"),
    )


def truncate_around_mention(
    tokens: Column | str, tok_start: Column | str, tok_end: Column | str, max_len: int = 32
) -> Column:
    """Slice a token array to ``max_len`` keeping the mention span centered
    (P5). Token-index columns are 0-based inclusive/exclusive like the
    char offsets."""
    arr = F.col(tokens) if isinstance(tokens, str) else tokens
    s = F.col(tok_start) if isinstance(tok_start, str) else tok_start
    e = F.col(tok_end) if isinstance(tok_end, str) else tok_end
    half = F.lit(max_len) - (e - s)
    lo = F.greatest(s - F.floor(half / 2).cast("int"), F.lit(0))
    lo = F.least(lo, F.greatest(F.size(arr) - F.lit(max_len), F.lit(0)))
    return F.slice(arr, lo + 1, F.lit(max_len))


def mark_span(text: Column | str, start: Column | str, end: Column | str) -> Column:
    """Insert [START_ENT]/[END_ENT] around the span (P6 debug column)."""
    t = F.col(text) if isinstance(text, str) else text
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    return F.concat(
        t.substr(F.lit(1), s),
        F.lit(START_TAG + " "),
        t.substr(s + 1, e - s),
        F.lit(" " + END_TAG),
        t.substr(e + 1, F.length(t) - e),
    )


def parse_markers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """P7: parse ``[[mention]]`` markers into spans over the *cleaned* text
    (markers removed). Emits one row per marked span with 0-based offsets.

    Pure Catalyst: the k-th marker's cleaned-text offset is its raw offset
    minus the 4k+2 bracket chars that precede its content.
    """
    t = F.col(text_col)
    cleaned = F.regexp_replace(t, r"\[\[(.*?)\]\]", r"$1")
    mentions = F.regexp_extract_all(t, F.lit(r"\[\[(.*?)\]\]"), 1)
    # raw start offsets of each marker: walk with aggregate over the mention
    # list, locating each occurrence after the previous one
    spans = F.aggregate(
        mentions,
        F.struct(
            F.lit(1).alias("from"),
            F.lit(0).alias("k"),
            F.array().cast("array<struct<m:string,s:int,e:int>>").alias("arr"),
        ),
        lambda acc, m: F.struct(
            (F.position(F.lit("[["), t, acc["from"]) + F.lit(2) + F.length(m) + F.lit(2)).alias("from"),
            (acc["k"] + 1).alias("k"),
            F.array_append(
                acc["arr"],
                F.struct(
                    m.alias("m"),
                    # position() is 1-based at the "[["; the content starts 2
                    # chars later; k complete markers (4 bracket chars each)
                    # precede it in the cleaned text
                    (F.position(F.lit("[["), t, acc["from"]) - 1 - acc["k"] * 4).alias("s"),
                    (
                        F.position(F.lit("[["), t, acc["from"]) - 1 - acc["k"] * 4 + F.length(m)
                    ).alias("e"),
                ),
            ).alias("arr"),
        ),
        lambda acc: acc["arr"],
    )
    out = df.withColumn("clean_text", cleaned).withColumn(
        "span", F.explode(spans)
    )
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.col("clean_text").alias(text_col),
        F.col("span.m").alias("mention"),
        F.col("span.s").alias("start"),
        F.col("span.e").alias("end"),
    )


def combine_span_probabilities(
    p_start: Column | str, p_end: Column | str, mode: str = "max_prod"
) -> Column:
    """F12: combine per-candidate start/end probability columns into a span
    score: max_prod -> p_s * p_e; max_start -> p_s; max_end -> p_e;
    max -> greatest(p_s, p_e). (extend/utils.py:25-75 semantics.)"""
    ps = F.col(p_start) if isinstance(p_start, str) else p_start
    pe = F.col(p_end) if isinstance(p_end, str) else p_end
    return {
        "max_prod": ps * pe,
        "max_start": ps,
        "max_end": pe,
        "max": F.greatest(ps, pe),
    }[mode]


def softmax_over(col: Column | str, partition_cols: list[str]) -> Column:
    """F11: softmax of a score column within a partition (window-based;
    numerically stabilized by the per-partition max)."""
    from pyspark.sql import Window

    c = F.col(col) if isinstance(col, str) else col
    w = Window.partitionBy(*partition_cols)
    ex = F.exp(c - F.max(c).over(w))
    return ex / F.sum(ex).over(w)

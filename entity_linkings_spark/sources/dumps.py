"""Converter-grade scans: MediaWiki/MySQL SQL dumps (S10) and CoNLL NER
files (S11) — the reference's appendix ingestion tooling
(/root/reference/entity_linkings/appendix/data_convert/) re-expressed as
Spark reads.

Design notes (these are one-time ingest converters, not hot-path operators):
  * SQL dumps: ``INSERT INTO `tbl` VALUES (...),(...);`` lines are parsed
    with a small per-partition Python state machine — tuple boundaries can
    hide inside quoted strings ('),(' sequences, escaped quotes), which no
    regex split handles correctly. Statements are independent lines, so the
    parse is embarrassingly parallel over partitions.
  * CoNLL: files are read WHOLE (one row per file, ``wholetext``) and then
    split entirely with Catalyst expressions — documents at ``-DOCSTART-``
    markers, sentences at blank lines, token/tag columns per line — so
    sentence and document structure survives partitioning exactly.

Both parsers also accept already-loaded DataFrames (``parse_*``), which is
what the driver's round-trip correctness queries use: format rows into dump
text with Spark, parse the text back, compare against the source table.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# S10: SQL dump scan
# ---------------------------------------------------------------------------

_INSERT_RE = re.compile(r"INSERT INTO [`\"]?(\w+)[`\"]? VALUES\s*", re.IGNORECASE)

# MySQL's mysqldump escape table (https://dev.mysql.com/doc/refman/8.0/en/
# string-literals.html): control escapes decode to their control character;
# anything else (\', \\, \", \%...) falls back to the literal next character
_MYSQL_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "0": "\0",
    "Z": "\x1a",
    "b": "\b",
}


def _split_tuples(values: str) -> Iterator[list[str | None]]:
    """Yield value tuples from the VALUES tail of one INSERT statement.
    Handles quoted strings with backslash escapes and '' doubling; NULL
    becomes None; numbers stay as raw strings (callers cast by schema)."""
    i, n = 0, len(values)
    while i < n:
        while i < n and values[i] in " ,;\n":
            i += 1
        if i >= n or values[i] != "(":
            break
        i += 1
        fields: list[str | None] = []
        buf: list[str] = []
        in_q = False
        was_q = False  # "this field was a quoted string" — so '' != NULL and
        # quoted whitespace survives (strip() applies ONLY to unquoted values;
        # a quoted ' ' must round-trip as ' ', found by the hypothesis test)
        while i < n:
            c = values[i]
            if in_q:
                if c == "\\" and i + 1 < n:
                    nxt = values[i + 1]
                    buf.append(_MYSQL_ESCAPES.get(nxt, nxt))
                    i += 2
                    continue
                if c == "'":
                    if i + 1 < n and values[i + 1] == "'":  # '' doubling
                        buf.append("'")
                        i += 2
                        continue
                    in_q = False
                    i += 1
                    continue
                buf.append(c)
                i += 1
                continue
            if c == "'" and not was_q:
                in_q = True
                was_q = True
                buf = []  # drop any whitespace buffered before the quote
                i += 1
                continue
            if c in ",)":
                if was_q:
                    fields.append("".join(buf))
                else:
                    raw = "".join(buf).strip()
                    fields.append(None if (raw.upper() == "NULL" or raw == "") else raw)
                buf = []
                was_q = False
                if c == ")":
                    i += 1
                    break
                i += 1
                continue
            if not was_q:
                buf.append(c)
            # after a closing quote, anything but the delimiter is dump
            # whitespace — skip it rather than pollute the quoted value
            i += 1
        yield fields


def parse_sql_dump(lines: DataFrame, table: str, text_col: str = "value") -> DataFrame:
    """(col0, col1, ... colN as strings) from INSERT statements for ``table``
    in a DataFrame of dump lines. Output column count = widest tuple seen is
    NOT inferred — rows come back as an array column ``fields`` (callers
    select/cast by position against their schema)."""

    def parse_part(rows):
        for r in rows:
            line = r[0]
            if line is None:
                continue
            m = _INSERT_RE.match(line.strip())
            if not m or m.group(1) != table:
                continue
            for tup in _split_tuples(line.strip()[m.end():]):
                yield (tup,)

    rdd = lines.select(text_col).rdd.mapPartitions(parse_part)
    return lines.sparkSession.createDataFrame(rdd, "fields array<string>")


def read_sql_dump(spark: SparkSession, path: str, table: str) -> DataFrame:
    """S10 entry point: parse a .sql dump file/directory into rows of
    ``fields array<string>`` for one table."""
    return parse_sql_dump(spark.read.text(path), table)


def format_sql_dump(
    df: DataFrame, table: str, rows_per_stmt: int = 100
) -> DataFrame:
    """Inverse of parse_sql_dump (used by the round-trip correctness query):
    pack rows into INSERT statements, ``rows_per_stmt`` tuples per line.
    All columns are rendered as quoted strings with backslash-escaped quotes
    AND mysqldump's control escapes (\\n \\t \\r \\0 \\Z \\b — the exact
    inverse of _MYSQL_ESCAPES, so parse(format(x)) round-trips control
    characters too); NULL renders as NULL."""

    def esc(c: str):
        s = F.regexp_replace(F.col(c).cast("string"), r"(['\\])", r"\\$1")
        for ch, letter in (("\n", "n"), ("\t", "t"), ("\r", "r"),
                           ("\x00", "0"), ("\x1a", "Z"), ("\x08", "b")):
            s = F.regexp_replace(s, ch, "\\\\" + letter)
        return s

    cols = [
        F.when(F.col(c).isNull(), F.lit("NULL")).otherwise(
            F.concat(F.lit("'"), esc(c), F.lit("'"))
        )
        for c in df.columns
    ]
    tup = F.concat(F.lit("("), F.concat_ws(",", *cols), F.lit(")"))
    grp = F.floor(
        (F.row_number().over(Window.orderBy(df.columns[0])) - 1) / rows_per_stmt
    )
    return (
        df.select(tup.alias("t"), grp.alias("g"))
        .groupBy("g")
        .agg(F.concat_ws(",", F.collect_list("t")).alias("tuples"))
        .select(
            F.concat(
                F.lit(f"INSERT INTO `{table}` VALUES "), F.col("tuples"), F.lit(";")
            ).alias("value")
        )
    )


# ---------------------------------------------------------------------------
# S11: CoNLL scan
# ---------------------------------------------------------------------------

def parse_conll(files: DataFrame, text_col: str = "value") -> DataFrame:
    """(*passthrough, doc_idx, sent_idx, tok_idx, token, tag) from whole-file
    CoNLL text — pure Catalyst: split documents at -DOCSTART- lines,
    sentences at blank lines, token lines at whitespace (first field = token,
    last = tag). Non-text columns of ``files`` (e.g. a file id) pass through."""
    keep = [c for c in files.columns if c != text_col]
    docs = files.select(
        *keep,
        F.posexplode(F.split(F.col(text_col), r"(?m)^-DOCSTART-[^\n]*\n?")).alias(
            "doc_idx", "doc"
        ),
    ).where(F.length(F.trim("doc")) > 0)
    sents = docs.select(
        *keep,
        "doc_idx",
        F.posexplode(F.split("doc", r"\n\s*\n")).alias("sent_idx", "sent"),
    ).where(F.length(F.trim("sent")) > 0)
    toks = sents.select(
        *keep,
        "doc_idx",
        "sent_idx",
        F.posexplode(F.split(F.trim("sent"), "\n")).alias("tok_idx", "line"),
    ).where(F.length(F.trim("line")) > 0)
    parts = F.split(F.trim("line"), r"\s+")
    return toks.select(
        *keep,
        "doc_idx",
        "sent_idx",
        "tok_idx",
        F.element_at(parts, 1).alias("token"),
        F.element_at(parts, -1).alias("tag"),
    )


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """S11 entry point: whole-file read keeps document/sentence order exact
    regardless of partitioning."""
    return parse_conll(spark.read.text(path, wholetext=True))

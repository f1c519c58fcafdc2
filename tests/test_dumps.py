"""S10/S11 converter scans: quote/escape/NULL handling in the SQL-dump
parser (the cases regex splitting gets wrong) and CoNLL structure parsing."""

from entity_linkings_spark.sources.dumps import (
    _split_tuples,
    format_sql_dump,
    parse_conll,
    parse_sql_dump,
)


def test_split_tuples_edge_cases():
    vals = (
        r"(1,'plain'),(2,'a\'b'),(3,'it''s'),(4,NULL),"
        r"(5,'),('),(6,''),(7,'back\\slash')"
    )
    got = list(_split_tuples(vals))
    assert got == [
        ["1", "plain"],
        ["2", "a'b"],
        ["3", "it's"],
        ["4", None],
        ["5", "),("],     # tuple boundary INSIDE a string survives
        ["6", ""],        # quoted empty string is '', not NULL
        ["7", "back\\slash"],
    ]


def test_split_tuples_mysql_control_escapes():
    """ADVICE r2: mysqldump's control escapes must decode to their control
    characters, not the literal following letter."""
    vals = r"(1,'a\nb\tc\rd'),(2,'z\0y\Zx\bw'),(3,'keep\%\_literal')"
    got = list(_split_tuples(vals))
    assert got == [
        ["1", "a\nb\tc\rd"],
        ["2", "z\0y\x1ax\bw"],
        # \% and \_ are LIKE-pattern escapes: identity fallback keeps the char
        ["3", "keep%_literal"],
    ]


def test_sql_dump_roundtrip_control_chars_spark(spark):
    rows = [(1, "line1\nline2\ttabbed", "a\rb"), (2, "nul\0sub\x1aback\bspace", None)]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    import pyspark.sql.functions as F
    back = parse_sql_dump(format_sql_dump(df, "t"), "t").select(
        F.element_at("fields", 1).cast("long").alias("id"),
        F.element_at("fields", 2).alias("a"),
        F.element_at("fields", 3).alias("b"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_sql_dump_roundtrip_spark(spark):
    rows = [
        (1, "it's got 'quotes'", None),
        (2, "back\\slash and ),( trap", "x"),
        (3, "", "y"),
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    dump = format_sql_dump(df, "t", rows_per_stmt=2)
    import pyspark.sql.functions as F
    back = parse_sql_dump(dump, "t").select(
        F.element_at("fields", 1).cast("long").alias("id"),
        F.element_at("fields", 2).alias("a"),
        F.element_at("fields", 3).alias("b"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # statements for another table are ignored
    assert parse_sql_dump(dump, "other").count() == 0


def test_parse_conll_structure(spark):
    text = (
        "-DOCSTART- -X- O\n"
        "Akira B-PER\nTanaka I-PER\n\n"
        "met O\nVera B-PER\n\n"
        "-DOCSTART- -X- O\n"
        "solo O\n"
    )
    files = spark.createDataFrame([("f1", text)], "fid string, value string")
    rows = parse_conll(files).collect()
    assert all(r["fid"] == "f1" for r in rows)
    got = {(r["doc_idx"], r["sent_idx"], r["tok_idx"], r["token"], r["tag"]) for r in rows}
    assert got == {
        (1, 0, 0, "Akira", "B-PER"),
        (1, 0, 1, "Tanaka", "I-PER"),
        (1, 1, 0, "met", "O"),
        (1, 1, 1, "Vera", "B-PER"),
        (2, 0, 0, "solo", "O"),
    }

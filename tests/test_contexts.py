"""Context windows, span marking/parsing, span-prob combination, softmax,
mention-counter source (SURVEY.md P4-P7, F11-F12, S4)."""

import json

import pyspark.sql.functions as F
import pytest

from entity_linkings_spark.operators.contexts import (
    combine_span_probabilities,
    cut_context_window,
    mark_span,
    parse_markers,
    softmax_over,
    truncate_around_mention,
)
from entity_linkings_spark.sources.alias_counts import (
    from_json_lines,
    load_mention_counter_json,
)


def test_cut_context_window(spark):
    df = spark.createDataFrame(
        [("x" * 100 + "MENTION" + "y" * 100, 100, 107)], ["text", "s", "e"]
    )
    r = df.select(cut_context_window("text", "s", "e", 20).alias("w")).collect()[0]["w"]
    assert r["context"][r["new_start"]:r["new_end"]] == "MENTION"
    assert len(r["context"]) <= 20 + 7 + 1
    # span near the start: window clamps at 0
    df2 = spark.createDataFrame([("MENTION tail", 0, 7)], ["text", "s", "e"])
    r2 = df2.select(cut_context_window("text", "s", "e", 20).alias("w")).collect()[0]["w"]
    assert r2["new_start"] == 0 and r2["context"][:7] == "MENTION"


def test_truncate_around_mention(spark):
    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(toks, 50, 52)], "tokens array<string>, s int, e int")
    out = df.select(truncate_around_mention("tokens", "s", "e", 10).alias("w")).collect()[0]["w"]
    assert len(out) == 10
    assert "t50" in out and "t51" in out  # mention kept
    # mention at the very start
    df2 = spark.createDataFrame([(toks, 0, 2)], "tokens array<string>, s int, e int")
    out2 = df2.select(truncate_around_mention("tokens", "s", "e", 10).alias("w")).collect()[0]["w"]
    assert out2[0] == "t0" and len(out2) == 10


def test_mark_span_roundtrip_with_parse(spark):
    df = spark.createDataFrame([("I met Akira Tanaka today", 6, 18)], ["text", "s", "e"])
    marked = df.select(mark_span("text", "s", "e").alias("m")).collect()[0]["m"]
    assert marked == "I met [START_ENT] Akira Tanaka [END_ENT] today"


def test_parse_markers(spark):
    df = spark.createDataFrame(
        [(1, "I met [[Akira Tanaka]] and [[Mei Zhang]] today"),
         (2, "no markers here")],
        ["id", "text"],
    )
    out = parse_markers(df).collect()
    assert len(out) == 2  # row 2 has no spans
    by_mention = {r["mention"]: r for r in out}
    for m, r in by_mention.items():
        assert r["text"][r["start"]:r["end"]] == m  # offsets index the CLEANED text
    assert set(by_mention) == {"Akira Tanaka", "Mei Zhang"}


def test_combine_span_probabilities(spark):
    df = spark.createDataFrame([(0.8, 0.5)], ["ps", "pe"])
    vals = df.select(
        combine_span_probabilities("ps", "pe", "max_prod").alias("prod"),
        combine_span_probabilities("ps", "pe", "max").alias("mx"),
    ).collect()[0]
    assert vals["prod"] == pytest.approx(0.4) and vals["mx"] == pytest.approx(0.8)


def test_softmax_over(spark):
    df = spark.createDataFrame(
        [("q", 1.0), ("q", 2.0), ("q", 3.0), ("r", 5.0)], ["qid", "score"]
    )
    out = df.withColumn("p", softmax_over("score", ["qid"])).collect()
    q = sorted([r["p"] for r in out if r["qid"] == "q"])
    assert sum(q) == pytest.approx(1.0)
    assert q[2] > q[1] > q[0]
    assert [r["p"] for r in out if r["qid"] == "r"] == [pytest.approx(1.0)]


def test_mention_counter_sources(spark, tmp_path):
    counter = {"New York": {"e1": 10, "e2": 3}, "ny": {"e1": 2}}
    p = tmp_path / "counter.json"
    p.write_text(json.dumps(counter))
    rows = {
        (r["mention"], r["entity_id"]): r["count"]
        for r in load_mention_counter_json(spark, str(p)).collect()
    }
    assert rows == {("New York", "e1"): 10, ("New York", "e2"): 3, ("ny", "e1"): 2}
    # jsonl/distributed variant
    df = spark.createDataFrame([(json.dumps(counter),)], ["value"])
    rows2 = {
        (r["mention"], r["entity_id"]): r["count"] for r in from_json_lines(df).collect()
    }
    assert rows2 == rows

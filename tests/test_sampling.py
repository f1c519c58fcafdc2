"""Deterministic split/sample operators: retry-stability, group-aware
leakage control, per-group caps, weight validation."""

import pyspark.sql.functions as F
import pytest

from entity_linkings_spark.operators.sampling import assign_splits, sample_per_group


def test_split_deterministic_and_proportional(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = assign_splits(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    # stable across a re-run AND a repartition (retry safety)
    b = assign_splits(df.repartition(13), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.select("k", "split").exceptAll(b.select("k", "split")).count() == 0


def test_split_group_aware_no_leakage(spark):
    # rows sharing a key land in the SAME split — split on the unit key
    df = spark.range(3000).select((F.col("id") % 300).alias("conv"), "id")
    s = assign_splits(df, "conv", {"train": 0.7, "val": 0.3})
    assert s.groupBy("conv").agg(F.countDistinct("split").alias("d")).where("d > 1").count() == 0


def test_split_weights_validated(spark):
    with pytest.raises(ValueError, match="sum to 1.0"):
        assign_splits(spark.range(5), "id", {"a": 0.5, "b": 0.4})


def test_sample_per_group_caps_and_determinism(spark):
    df = spark.range(1000).select((F.col("id") % 7).alias("g"), "id")
    s = sample_per_group(df, "g", 5, "id")
    per_g = {r["g"]: r["n"] for r in s.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n == 5 for n in per_g.values()) and len(per_g) == 7
    # groups smaller than n keep everything
    small = spark.range(3).select(F.lit(0).alias("g"), "id")
    assert sample_per_group(small, "g", 10, "id").count() == 3
    # deterministic under repartition
    s2 = sample_per_group(df.repartition(11), "g", 5, "id")
    assert s.exceptAll(s2).count() == 0


def test_split_weights_must_be_positive(spark):
    with pytest.raises(ValueError, match="positive"):
        assign_splits(spark.range(5), "id", {"a": 1.5, "b": -0.5})


def test_weighted_mix_rates_and_determinism(spark):
    from entity_linkings_spark.operators.sampling import weighted_mix

    df = spark.range(3000).select(
        (F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))).alias("source"),
        "id",
    )
    rates = {"s0": (3, 1), "s1": (5, 2), "s2": (1, 4)}
    out = weighted_mix(df, "id", rates).cache()
    per_s = {r["source"]: r["n"]
             for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_s["s0"] == 3000  # integer repeat: exactly 3x of 1000 rows
    assert abs(per_s["s1"] - 2500) < 120  # 5/2 in expectation, hash-selected
    assert abs(per_s["s2"] - 250) < 80    # 1/4 downsample
    # copy indices are dense per row
    mx = out.groupBy("source", "id").agg(F.count("*").alias("n"),
                                         F.max("copy_idx").alias("m"))
    assert mx.where(F.col("m") != F.col("n") - 1).count() == 0
    # deterministic under repartition (retry stability)
    out2 = weighted_mix(df.repartition(13), "id", rates)
    assert out.exceptAll(out2).count() == 0 and out2.exceptAll(out).count() == 0


def test_weighted_mix_drop_default_and_validation(spark):
    import pytest as _pytest

    from entity_linkings_spark.operators.sampling import weighted_mix

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "source string, id long"
    )
    # x0 drops the source entirely; unconfigured sources pass through at 1x
    out = weighted_mix(df, "id", {"a": (0, 1)}).collect()
    assert {(r["source"], r["id"], r["copy_idx"]) for r in out} == {
        ("b", 2, 0), ("b", 3, 0)
    }
    with _pytest.raises(ValueError, match="num>=0/den>=1"):
        weighted_mix(df, "id", {"a": (1, 0)})
    with _pytest.raises(ValueError, match="num>=0/den>=1"):
        weighted_mix(df, "id", {"a": (2.5, 1)})


def test_temperature_rates_pure_config():
    """No Spark involved: temperature flattening happens once at config
    time; engines only ever see the rational output."""
    from fractions import Fraction

    from entity_linkings_spark.operators.sampling import temperature_rates

    counts = {"big": 8000, "mid": 1500, "small": 500}
    # tau=1: natural mix — every rate exactly 1/1
    assert temperature_rates(counts, 1.0) == {s: (1, 1) for s in counts}
    # tau=0: uniform target — rate_s = total / (K * c_s), exactly rational
    r0 = temperature_rates(counts, 0.0)
    total, k = 10000, 3
    for s, c in counts.items():
        assert Fraction(*r0[s]) == Fraction(total, k * c)
    # tau in (0,1) flattens: small sources up-weighted, big down-weighted
    r = temperature_rates(counts, 0.5)
    assert Fraction(*r["small"]) > 1 > Fraction(*r["big"])
    # expected row mass is preserved: sum(c_s * rate_s) == total (rates are
    # q_s/p_s, and q sums to 1) — within the rationalization tolerance
    approx = sum(c * Fraction(*r[s]) for s, c in counts.items())
    assert abs(float(approx) - total) / total < 1e-3
    # denominators respect the cap; validation errors are loud
    assert all(den <= 1000 for _, den in r.values())
    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        temperature_rates({"a": 0}, 0.5)
    with _pytest.raises(ValueError, match=">= 0"):
        temperature_rates(counts, -1.0)


def test_filter_blocked_domains_suffix_semantics(spark):
    from entity_linkings_spark.operators.sampling import (
        blocked_host_set,
        filter_blocked_domains,
    )

    rows = [
        (1, "example.com"),          # exact rule hit
        (2, "www.example.com"),      # subdomain of a rule
        (3, "a.b.example.com"),      # deep subdomain
        (4, "notexample.com"),       # suffix STRING but not label suffix
        (5, "example.com.evil.org"), # rule in the middle: not a suffix
        (6, "clean.org"),
        (7, "ads.tracker.net"),      # multi-label rule
        (8, "tracker.net"),          # the rule host itself
        (9, "other.net"),
    ]
    bl = spark.createDataFrame([("example.com",), ("tracker.net",)], "rule string")
    df = spark.createDataFrame(rows, "doc_id long, host string")
    kept = {r["doc_id"] for r in filter_blocked_domains(df, bl).collect()}
    assert kept == {4, 5, 6, 9}
    bad = {r["host"] for r in blocked_host_set(df.select("host"), bl).collect()}
    assert bad == {"example.com", "www.example.com", "a.b.example.com",
                   "ads.tracker.net", "tracker.net"}


def test_registrable_domain_psl_lite(spark):
    """eTLD+1 resolution (VERDICT r6 #6): longest public suffix wins,
    host-is-a-public-suffix maps to itself, unknown TLDs fall back to the
    implicit-'*' last-two-labels rule, single-label hosts to themselves."""
    from entity_linkings_spark.operators.sampling import registrable_domain

    psl = spark.createDataFrame(
        [("com",), ("co.uk",), ("uk",), ("github.io",), ("io",)],
        "suffix string",
    )
    hosts = [
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.example.co.uk", "example.co.uk"),   # co.uk beats uk
        ("b.example.co.uk", "example.co.uk"),
        ("user.github.io", "user.github.io"),   # github.io beats io
        ("github.io", "github.io"),             # host IS a public suffix
        ("deep.x.example.zz", "example.zz"),    # unknown TLD -> last two
        ("localhost", "localhost"),             # single label -> itself
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["reg_domain"]
           for r in registrable_domain(df, psl).collect()}
    assert got == dict(hosts)


def test_registrable_domain_wildcard_and_exception_rules(spark):
    """The full PSL rule syntax (the Mozilla-list '*.ck' / '!www.ck'
    canonical example): every label under a wildcard base is a public
    suffix, exceptions prevail outright and are themselves registrable."""
    from entity_linkings_spark.operators.sampling import registrable_domain

    psl = spark.createDataFrame(
        [("com",), ("*.ck",), ("!www.ck",)], "suffix string"
    )
    hosts = [
        ("foo.bar.ck", "foo.bar.ck"),   # bar.ck public via *.ck
        ("a.foo.bar.ck", "foo.bar.ck"),
        ("bar.ck", "bar.ck"),           # host IS a (wildcard) public suffix
        ("www.ck", "www.ck"),           # exception: registrable itself
        ("foo.www.ck", "www.ck"),       # exception beats the wildcard
        ("x.a.b.com", "b.com"),         # plain rules unaffected
        ("ck", "ck"),                   # the wildcard base alone is NOT
                                        # public -> single-label fallback
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {r["host"]: r["reg_domain"]
           for r in registrable_domain(df, psl).collect()}
    assert got == dict(hosts)

"""Deterministic dataset splitting & sampling — the selection operators a
training-data pipeline needs around the cleaning/dedup stages.

Both operators are pure Catalyst and HASH-DRIVEN rather than random:
``rand()`` changes across runs/retries (a retried task would reshuffle
examples between train and val — leakage), while md5-derived assignment is
a function of the ROW, so it is stable under retries, re-partitioning,
incremental reruns and engine changes (the DuckDB oracles replay the exact
same arithmetic; same h60 scheme as functions/hashing.py).

Scale notes: split assignment is a projection (no shuffle); per-group
sampling is one window over the group key — the same shuffle any
per-group top-k costs. Neither collects anything to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from entity_linkings_spark.functions.hashing import h60

# h60 yields 60-bit non-negative hashes; buckets are fractions of 2^60
_H60_SPACE = float(1 << 60)


def split_column(
    key: Column | str,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Split-name column: md5-hash the key (salted, so different splits of
    the same table are independent), map the 60-bit hash to [0, 1), and
    assign by cumulative weight ranges. Deterministic per row, exact in any
    engine that can md5."""
    if not weights or abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0: {weights}")
    if any(v <= 0 for v in weights.values()):
        raise ValueError(f"split weights must be positive: {weights}")
    k = F.col(key) if isinstance(key, str) else key
    u = h60(F.concat(F.lit(salt + ":"), k.cast("string"))) / F.lit(_H60_SPACE)
    names = list(weights)
    expr = F.lit(names[-1])  # last split takes the tail (sums to 1.0)
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((name, cum))
    for name, ub in reversed(conds):
        expr = F.when(u < F.lit(ub), F.lit(name)).otherwise(expr)
    return expr


def assign_splits(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """df + a ``split`` column. Rows with the same key ALWAYS land in the
    same split (group-aware leakage control: split on conv_id/doc family id,
    not on the row id, when rows of one unit must not straddle splits)."""
    return df.withColumn(out, split_column(key, weights, salt))


def temperature_rates(
    counts: dict[str, int],
    tau: float,
    max_den: int = 1000,
) -> dict[str, tuple[int, int]]:
    """Config-time bridge from temperature sampling to weighted_mix's
    rational rates: with natural source shares p_s = c_s / sum(c) and
    temperature-flattened targets q_s ∝ c_s^tau, the per-source
    up/down-weighting factor is q_s / p_s — rationalized here
    (Fraction.limit_denominator, deterministic stdlib) so the ENGINES only
    ever see integer num/den. The float pow happens exactly once, on the
    driver, over the config-sized counts dict; no per-row float crosses an
    engine boundary, which is what keeps the mix bit-replayable in the
    DuckDB oracle (VERDICT r4 #5).

    tau=1 returns 1/1 for every source (natural mix); tau=0 equalizes
    sources (rate ∝ 1/p_s, normalized so rates average to 1 over rows)."""
    from fractions import Fraction

    if not counts or any(c <= 0 for c in counts.values()):
        raise ValueError(f"counts must be positive: {counts}")
    if tau < 0:
        raise ValueError(f"temperature must be >= 0: {tau}")
    total = sum(counts.values())
    qs = {s: c ** tau for s, c in counts.items()}
    qtot = sum(qs.values())
    out = {}
    for s, c in counts.items():
        rate = (qs[s] / qtot) / (c / total)
        f = Fraction(rate).limit_denominator(max_den)
        out[s] = (f.numerator, f.denominator)
    return out


def weighted_mix(
    df: DataFrame,
    key_col: str,
    rates: dict[str, tuple[int, int]],
    source_col: str = "source",
    default: tuple[int, int] = (1, 1),
    salt: str = "mix",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Weighted source mixing — the LM-dataprep sampler that up/down-weights
    corpora ("books x2.5, web x1/3") when assembling a training mix. Each
    row is emitted ``num // den`` times, plus one extra copy iff
    h60(salt:source:key) % den < num % den — so a source with rate p/q
    contributes EXACTLY p/q of its rows in expectation, deterministically:
    the same row always gets the same copy count under retries,
    repartitioning, and engine changes (same md5 scheme as split_column; a
    different ``salt`` re-rolls the fractional picks per epoch).

    Rates are RATIONAL (integer num/den) by design: temperature-style
    weights (count^t / sum) must be rationalized by the caller first —
    float pow/ln differs in the last ulp across engines, which is exactly
    the cross-engine drift a deterministic sampler exists to rule out.

    Scale: a projection + explode — no shuffle, no window, nothing
    collected; the when-chain is config-sized (one branch per configured
    source). Output repeats the input columns with ``out_col`` making each
    copy unique (0..n_copies-1)."""
    for s, (p, q) in rates.items():
        if not (isinstance(p, int) and isinstance(q, int)) or p < 0 or q < 1:
            raise ValueError(f"rate for {s!r} must be ints num>=0/den>=1: {(p, q)}")
    p0, q0 = default
    if not (isinstance(p0, int) and isinstance(q0, int)) or p0 < 0 or q0 < 1:
        raise ValueError(f"default rate must be ints num>=0/den>=1: {default}")
    num: Column = F.lit(p0)
    den: Column = F.lit(q0)
    for s, (p, q) in rates.items():
        num = F.when(F.col(source_col) == s, F.lit(p)).otherwise(num)
        den = F.when(F.col(source_col) == s, F.lit(q)).otherwise(den)
    h = h60(
        F.concat(
            F.lit(salt + ":"),
            F.col(source_col).cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        )
    )
    # exact integer arithmetic end to end: base copies + the hash-selected
    # fractional copy (h % den is uniform over [0, den))
    n_copies = (
        F.floor(num.cast("long") / den).cast("int")
        + (h % den < num % den).cast("int")
    )
    return (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") >= 1)  # also keeps sequence() ascending-safe
        .withColumn(out_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def sample_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    salt: str = "sample",
) -> DataFrame:
    """At most ``n`` rows per group, chosen by md5 order of the row key —
    a deterministic stratified sample (every group contributes, no group
    dominates), reproducible across runs and engines. Ties are impossible
    (the hash input includes the unique row key; the key itself breaks any
    residual collision)."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def blocked_host_set(
    hosts: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
) -> DataFrame:
    """The distinct hosts matched by a domain blocklist under SUFFIX
    semantics (rule 'example.com' blocks 'example.com' and any
    '*.example.com', but never 'notexample.com'): each host explodes into
    its label suffixes (functions/strings.py host_suffixes, fan-out = label
    count) and semi-joins the broadcast rule dimension on the suffix — a
    plain equi-join, where the naive LIKE-suffix formulation would be a
    nested-loop join Spark cannot shuffle."""
    from entity_linkings_spark.functions.strings import host_suffixes

    sufs = hosts.select(
        F.col(host_col),
        F.explode(host_suffixes(F.col(host_col))).alias("_suf"),
    )
    rules = blocklist.select(F.col(rule_col).alias("_suf"))
    return (
        sufs.join(F.broadcast(rules), "_suf", "left_semi")
        .select(host_col)
        .distinct()
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    rule_col: str = "rule",
) -> DataFrame:
    """Drop every row whose host is caught by the blocklist (suffix
    semantics — see blocked_host_set): the standard crawl-prep companion of
    canonicalize_url. Two joins, both cheap at 100 TB: the suffix semi-join
    runs over DISTINCT hosts (web corpora have ~1e6-1e7 hosts, orders of
    magnitude below row count), and the final anti-join keys on the host
    with the small blocked set on the build side (AQE broadcasts it)."""
    hosts = df.select(host_col).distinct()
    bad = blocked_host_set(hosts, blocklist, host_col, rule_col)
    return df.join(bad, host_col, "left_anti")


def registrable_domain(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "reg_domain",
    suffix_col: str = "suffix",
) -> DataFrame:
    """Append the REGISTRABLE domain (eTLD+1) of each host — the key
    crawl prep actually caps and groups by: 'a.example.com' and
    'b.example.com' belong to one registrant, and so do
    'a.example.co.uk' / 'b.example.co.uk', which a naive "last two
    labels" rule would wrongly split from each other ('co.uk' is a
    PUBLIC suffix). ``psl`` is a public-suffix dimension in the Mozilla
    list's rule syntax: plain suffixes ('co.uk'), wildcards ('*.ck' —
    every single label under ck is a public suffix), and exceptions
    ('!www.ck' — www.ck is registrable despite the wildcard).

    Semantics (the PSL algorithm): exceptions prevail outright — the
    matched name ITSELF is the registrable domain; otherwise the
    registrable domain is the label suffix ONE label longer than the
    LONGEST matching public suffix (plain match, or one-label-longer-
    than-base for wildcards). Fallbacks: a host that IS a public suffix
    maps to itself; a host matching no rule falls back to its last two
    labels (the implicit '*' rule of the PSL), or to itself if it has
    only one label.

    Plan: host ladder explode (functions/strings.py host_suffixes,
    fan-out = label count ~4-6) equi-joined against the BROADCAST psl
    dimension, one min-index aggregate per distinct host, and a
    broadcast-size rejoin — the blocked_host_set shuffle shape; never a
    LIKE nested-loop, never a row-count-sized fan-out (the ladder runs
    over DISTINCT hosts only)."""
    from entity_linkings_spark.functions.strings import host_suffixes

    hosts = df.select(host_col).distinct().withColumn(
        "_sufs", host_suffixes(F.col(host_col))
    )
    lad = hosts.select(
        host_col, F.posexplode("_sufs").alias("_idx", "_suf")
    )
    r = F.col(suffix_col)
    # one tagged rule dimension — n(ormal)/w(ildcard)/e(xception) — so ONE
    # broadcast join + ONE host aggregate resolves all three rule forms
    # (three per-type joins would chain three host-keyed shuffles)
    rules = psl.select(
        F.when(r.startswith("*."), F.expr(f"substring({suffix_col}, 3)"))
        .when(r.startswith("!"), F.expr(f"substring({suffix_col}, 2)"))
        .otherwise(r).alias("_suf"),
        F.when(r.startswith("*."), F.lit("w"))
        .when(r.startswith("!"), F.lit("e"))
        .otherwise(F.lit("n")).alias("_t"),
    )
    t = F.col("_t")
    best = (
        lad.join(F.broadcast(rules), "_suf")
        .groupBy(host_col)
        .agg(
            F.min(F.when(t == "n", F.col("_idx"))).alias("_n"),
            # '*.base': the suffix ONE label longer than base is public,
            # so a ladder hit on base at _idx implies a public suffix at
            # _idx - 1 (the base alone stays non-public)
            F.min(F.when((t == "w") & (F.col("_idx") >= 1),
                         F.col("_idx") - 1)).alias("_w"),
            F.min(F.when(t == "e", F.col("_idx"))).alias("_e"),
        )
    )
    # 0-based index of the PUBLIC suffix: exceptions prevail (the matched
    # name itself is registrable, i.e. the public suffix sits one label
    # shorter); otherwise the longest (min-index) of plain/wildcard hits
    p = F.when(F.col("_e").isNotNull(), F.col("_e") + 1).otherwise(
        F.least("_n", "_w")
    )
    resolved = (
        hosts.join(best, host_col, "left")
        .select(
            host_col,
            F.element_at(
                "_sufs",
                F.greatest(
                    F.coalesce(p, F.size("_sufs") - F.lit(1)),
                    F.lit(1),
                ).cast("int"),
            ).alias(out_col),
        )
    )
    return df.join(resolved, host_col, "left")

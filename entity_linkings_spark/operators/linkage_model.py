"""Fellegi-Sunter probabilistic linkage model with unsupervised EM weight
estimation — the classical record-linkage layer (Fellegi & Sunter 1969)
on top of the engine's deterministic similarity features, architected the
way Splink does it for Spark backends (public design: comparison-vector
AGGREGATION in the engine, EM on the tiny aggregate in the driver):

  1. ``comparison_levels`` discretizes each similarity feature into a
     small ordinal gamma level (pure Catalyst when-chains — no UDF);
  2. ``pattern_counts`` aggregates pair counts per full gamma VECTOR —
     ONE shuffle whose key space is bounded by prod(levels) (e.g. 3^4 =
     81 rows) regardless of corpus size, with map-side partial combine;
  3. ``em_fit`` runs expectation-maximization on that driver-resident
     pattern table under the standard conditional-independence model:
     lambda (match proportion), m_k[l] = P(gamma_k = l | match),
     u_k[l] = P(gamma_k = l | non-match). Deterministic: fixed
     initialization, fixed iteration count, pure Python floats — the
     distributed work is exact integer counting, so a rerun reproduces
     the parameters bit-for-bit;
  4. ``fs_score`` turns the fitted parameters into a pure arithmetic
     column expression — per-level log2 Bayes factors folded into chained
     ``when`` literals, summed with the prior odds into the match weight
     and posterior. No join, no UDF: the scoring stage is whole-stage
     codegen over literals, which is the cheapest possible per-pair cost
     at 100 TB.

Why this matters next to the blended ``combined`` score (scoring.py): the
blend's weights are hand-fixed; Fellegi-Sunter LEARNS per-feature,
per-level evidence weights from the unlabeled candidate pairs themselves
— feature levels that are common among non-matches get small Bayes
factors automatically (agreement on a frequent pattern is weak evidence),
which is the principled version of what the resolve threshold hand-tunes.
The reference has no analogue (its reranker is a trained neural scorer,
crossencoder.py:142-162); this is the classical, auditable replacement.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .blocking import sorted_neighborhood_pairs


def comparison_levels(
    scored: DataFrame, thresholds: dict[str, list[float]]
) -> DataFrame:
    """Add one ordinal ``gamma_<feature>`` column per entry: level = how
    many of the feature's ascending thresholds the value reaches (0 =
    below all = weakest agreement). NULL feature values read level 0 —
    missing evidence is treated as maximal disagreement, the conservative
    Fellegi-Sunter convention."""
    out = scored
    for feat, ths in thresholds.items():
        if sorted(ths) != list(ths):
            raise ValueError(f"thresholds for {feat} must be ascending: {ths}")
        level: Column = F.lit(0)
        for t in ths:
            level = level + F.when(F.col(feat) >= t, 1).otherwise(0)
        out = out.withColumn(f"gamma_{feat}", level.cast("int"))
    return out


def pattern_counts(levels: DataFrame, features: list[str]) -> DataFrame:
    """(gamma_f1, ..., gamma_fK, n) — pair counts per comparison vector.
    The ONLY distributed step of the fit: one hash aggregate whose result
    is at most prod(n_levels) rows, independent of pair volume."""
    cols = [f"gamma_{f}" for f in features]
    return levels.groupBy(*cols).agg(F.count("*").alias("n"))


@dataclass(frozen=True)
class FSParams:
    """Fitted Fellegi-Sunter parameters: feature order, per-feature level
    counts, match proportion, and the conditional level probabilities."""

    features: tuple[str, ...]
    n_levels: tuple[int, ...]
    lam: float
    m: tuple[tuple[float, ...], ...]  # m[k][l] = P(level l | match)
    u: tuple[tuple[float, ...], ...]  # u[k][l] = P(level l | non-match)
    n_iter: int
    delta: float  # last-iteration max parameter change

    def log2_bf(self, k: int, level: int) -> float:
        """Per-feature log2 Bayes factor at a level (m/u, floored away
        from 0 so a level unseen in one class stays finite)."""
        return math.log2(max(self.m[k][level], 1e-12)
                         / max(self.u[k][level], 1e-12))

    @property
    def prior_odds_log2(self) -> float:
        return math.log2(max(self.lam, 1e-12) / max(1.0 - self.lam, 1e-12))


def em_fit(
    patterns: DataFrame | list,
    features: list[str],
    n_levels: dict[str, int],
    n_iter: int = 30,
    init_lambda: float = 0.1,
    fixed_u: tuple[tuple[float, ...], ...] | None = None,
) -> FSParams:
    """EM under conditional independence on the aggregated pattern table.

    ``patterns``: the pattern_counts output (collected here — it is at
    most prod(n_levels) rows by construction) or an already-collected
    list of Rows/tuples. Initialization is fixed and deterministic
    (m mass ramps toward high levels, u toward low), iteration count is
    fixed, and all arithmetic is driver-side Python floats over exact
    integer counts — reruns reproduce the parameters bit-for-bit.
    Labels are never used: this is the unsupervised half of the audit
    story (compare the learned weights against silver labels in tests).

    ``fixed_u``: hold the non-match conditionals at these values and fit
    only lambda and m — the production recipe (Splink's public training
    design) when u comes from ``estimate_u`` over random pairs: blocked
    candidate pairs OVER-represent agreeing non-matches, so free EM's u
    absorbs that selection bias; u measured on uniform random pairs is
    unbiased, and fixing it removes the biggest identifiability failure
    mode of the two-class mixture."""
    if isinstance(patterns, DataFrame):
        rows = [
            (tuple(int(r[f"gamma_{f}"]) for f in features), int(r["n"]))
            for r in patterns.collect()  # bounded: <= prod(n_levels) rows
        ]
    else:
        rows = [
            (tuple(int(x) for x in gamma), int(n)) for gamma, n in patterns
        ]
    # canonical order: collect() row order depends on partitioning, and
    # float accumulation order would otherwise leak it into the fitted
    # parameters — sorted, the fit is bit-identical across reruns and
    # across DataFrame-vs-list inputs
    rows.sort()
    K = len(features)
    L = [n_levels[f] for f in features]
    total = sum(n for _, n in rows)
    if total == 0:
        raise ValueError("em_fit needs at least one pattern row")

    # deterministic init: matches prefer high levels, non-matches low
    def ramp(nl: int, up: bool) -> list[float]:
        raw = [(l + 1.0) if up else (nl - l) for l in range(nl)]
        s = sum(raw)
        return [x / s for x in raw]

    lam = init_lambda
    m = [ramp(L[k], up=True) for k in range(K)]
    if fixed_u is not None:
        if tuple(len(row) for row in fixed_u) != tuple(L):
            raise ValueError(
                f"fixed_u level counts {[len(r) for r in fixed_u]} != {L}"
            )
        u = [list(row) for row in fixed_u]
    else:
        u = [ramp(L[k], up=False) for k in range(K)]
    delta = float("inf")
    for _ in range(n_iter):
        # E-step: match posterior per pattern
        post = []
        for gamma, n in rows:
            pm, pu = lam, 1.0 - lam
            for k in range(K):
                pm *= m[k][gamma[k]]
                pu *= u[k][gamma[k]]
            post.append(pm / (pm + pu) if (pm + pu) > 0 else 0.0)
        # M-step
        wm = sum(p * n for p, (_, n) in zip(post, rows))
        wu = total - wm
        new_lam = wm / total
        new_m = [[0.0] * L[k] for k in range(K)]
        new_u = [[0.0] * L[k] for k in range(K)]
        for p, (gamma, n) in zip(post, rows):
            for k in range(K):
                new_m[k][gamma[k]] += p * n
                new_u[k][gamma[k]] += (1.0 - p) * n
        for k in range(K):
            for l in range(L[k]):
                new_m[k][l] = new_m[k][l] / wm if wm > 0 else 1.0 / L[k]
                new_u[k][l] = new_u[k][l] / wu if wu > 0 else 1.0 / L[k]
        if fixed_u is not None:
            new_u = u  # u is data, not a parameter, in this regime
        delta = max(
            abs(new_lam - lam),
            max(
                abs(new_m[k][l] - m[k][l])
                for k in range(K) for l in range(L[k])
            ),
            max(
                abs(new_u[k][l] - u[k][l])
                for k in range(K) for l in range(L[k])
            ),
        )
        lam, m, u = new_lam, new_m, new_u
    return FSParams(
        features=tuple(features),
        n_levels=tuple(L),
        lam=lam,
        m=tuple(tuple(row) for row in m),
        u=tuple(tuple(row) for row in u),
        n_iter=n_iter,
        delta=delta,
    )


def _bf_expr(params: FSParams, k: int) -> Column:
    """Chained-when literal expression for feature k's log2 Bayes factor
    at the row's gamma level."""
    col = F.col(f"gamma_{params.features[k]}")
    expr: Column = F.lit(float(params.log2_bf(k, 0)))
    for l in range(1, params.n_levels[k]):
        expr = F.when(col == l, float(params.log2_bf(k, l))).otherwise(expr)
    return expr


def _posterior(weight_col: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -weight_col))


def fs_score(levels: DataFrame, params: FSParams) -> DataFrame:
    """Attach ``fs_weight`` (prior log-odds + sum of per-feature log2
    Bayes factors) and ``fs_posterior`` (= sigmoid in base 2). The fitted
    parameters enter as LITERALS in chained when-expressions — the whole
    scoring stage is Catalyst arithmetic inside whole-stage codegen: no
    join, no UDF, no shuffle."""
    weight: Column = F.lit(float(params.prior_odds_log2))
    for k in range(len(params.features)):
        weight = weight + _bf_expr(params, k)
    out = levels.withColumn("fs_weight", weight)
    return out.withColumn("fs_posterior", _posterior(F.col("fs_weight")))


def fs_explain(levels: DataFrame, params: FSParams) -> DataFrame:
    """The match-weight waterfall (the audit view Splink renders as a
    chart): one ``bf_<feature>`` column per feature holding that
    feature's log2 Bayes-factor contribution at the row's gamma level,
    plus the constant ``prior_log2_odds`` — so
    ``prior_log2_odds + sum(bf_*) == fs_weight`` EXACTLY (same literal
    expressions, same float addition order as fs_score). Per-pair
    explanations therefore cost one codegen projection, no second scoring
    pass, and a reviewer can read off which feature carried or killed any
    decision."""
    out = levels.withColumn(
        "prior_log2_odds", F.lit(float(params.prior_odds_log2))
    )
    weight: Column = F.col("prior_log2_odds")
    for k, feat in enumerate(params.features):
        out = out.withColumn(f"bf_{feat}", _bf_expr(params, k))
        weight = weight + F.col(f"bf_{feat}")
    out = out.withColumn("fs_weight", weight)
    return out.withColumn("fs_posterior", _posterior(F.col("fs_weight")))


def fit_fs_model(
    scored: DataFrame,
    thresholds: dict[str, list[float]],
    n_iter: int = 30,
    init_lambda: float = 0.1,
) -> tuple[DataFrame, FSParams]:
    """End-to-end convenience: discretize -> aggregate -> EM -> score.
    Returns (scored pairs + gamma/fs columns, fitted params). Two jobs
    total: the bounded pattern aggregate, then one codegen scoring pass."""
    features = list(thresholds)
    levels = comparison_levels(scored, thresholds)
    params = em_fit(
        pattern_counts(levels, features),
        features,
        {f: len(t) + 1 for f, t in thresholds.items()},
        n_iter=n_iter,
        init_lambda=init_lambda,
    )
    return fs_score(levels, params), params


# --------------------------------------------------------------------------
# Term-frequency adjustments (Winkler 1988; Splink's tf_adjustments)
# --------------------------------------------------------------------------

def term_frequencies(records: DataFrame, value_col: str) -> DataFrame:
    """(value, n, tf): relative term frequency of each non-null value in
    the record corpus. One hash aggregate plus a single-row broadcast
    cross join for the total — the tf table itself stays distributed
    (it is vocabulary-sized, NOT bounded; never collect it)."""
    vals = records.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("value")
    )
    counts = vals.groupBy("value").agg(F.count("*").alias("n"))
    total = vals.groupBy().agg(F.count("*").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value", "n", (F.col("n") / F.col("_total")).alias("tf")
    )


def agreement_u(tf: DataFrame) -> float:
    """P(two uniform random records agree on the column) = sum_v tf(v)^2
    — the value-averaged u-probability of the exact-agreement level that
    the per-value adjustment is taken RELATIVE to. One aggregate, one
    scalar collected."""
    row = tf.groupBy().agg(F.sum(F.col("tf") * F.col("tf")).alias("u")).collect()
    return float(row[0]["u"]) if row and row[0]["u"] is not None else 0.0


def tf_adjusted_score(
    scored_fs: DataFrame,
    params: FSParams,
    feat: str,
    tf: DataFrame,
    value_a: str = "surface_a",
    value_b: str = "surface_b",
    u_bar: float | None = None,
    min_tf: float = 1e-12,
) -> DataFrame:
    """Per-value term-frequency adjustment of the match weight for one
    feature's EXACT-agreement level — Winkler's 1988 refinement, in
    Splink's published formulation: agreement on "john smith" is much
    weaker evidence than agreement on a rare name, because the average
    Bayes factor m/u uses u = sum_v tf(v)^2 while agreement specifically
    on value v has u_v = tf(v)^2 and m_v ≈ m·tf(v), giving
    BF_v = m/tf(v) — i.e. an additive log2 correction of
    ``log2(u_bar / tf(v))``: positive (more evidence) for values rarer
    than average, negative for stock values.

    Applies only where the pair EXACTLY agrees (``value_a == value_b``)
    AND sits at the feature's top gamma level; all other rows get
    adjustment 0. Shape: one equi-join of the pair table against the
    vocabulary-sized tf table on the agreed value — AQE picks broadcast
    vs shuffle by the tf table's real size; no UDF, no extra shuffle on
    the pair side beyond the join itself.

    Adds ``tf_adj_<feat>``, ``fs_weight_tf``, ``fs_posterior_tf``.
    ``u_bar`` may be precomputed via ``agreement_u`` (pass it when
    adjusting several features off the same tf table)."""
    if u_bar is None:
        u_bar = agreement_u(tf)
    top = params.n_levels[params.features.index(feat)] - 1
    agrees = (F.col(value_a) == F.col(value_b)) & (
        F.col(f"gamma_{feat}") == top
    )
    joined = scored_fs.join(
        tf.select(
            F.col("value").alias(value_a), F.col("tf").alias("_tf")
        ),
        value_a,
        "left",
    )
    adj = F.when(
        agrees & F.col("_tf").isNotNull(),
        F.log2(
            F.lit(float(max(u_bar, min_tf)))
            / F.greatest(F.col("_tf"), F.lit(float(min_tf)))
        ),
    ).otherwise(F.lit(0.0))
    out = (
        joined.withColumn(f"tf_adj_{feat}", adj)
        .withColumn(
            "fs_weight_tf", F.col("fs_weight") + F.col(f"tf_adj_{feat}")
        )
        .drop("_tf")
    )
    return out.withColumn("fs_posterior_tf", _posterior(F.col("fs_weight_tf")))


# --------------------------------------------------------------------------
# u-estimation from deterministic random pairs (Splink's
# estimate_u_using_random_sampling, made reproducible)
# --------------------------------------------------------------------------

def random_comparison_pairs(
    records: DataFrame,
    id_col: str = "skey",
    salt: str = "u-est",
    k: int = 1,
    num_ranges: int | None = None,
) -> DataFrame:
    """~k·N uniform-random record pairs, DETERMINISTICALLY: order the
    corpus by md5(salt ‖ id) — random with respect to any entity
    structure, identical across reruns — and pair each record with its
    next k neighbors in that order. Reuses sorted_neighborhood_pairs'
    scale shape (bounded-collect global rank + explode/equi-join, linear
    candidate volume); the only new ingredient is the hash sort key.
    Output (<id_col>_a, <id_col>_b, gap); the tail's last k records pair
    fewer times (non-wrapping), which is immaterial at estimation sample
    sizes."""
    hashed = records.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(salt), F.lit("\x1f"), F.col(id_col).cast("string"))).alias("_hkey"),
    )
    return sorted_neighborhood_pairs(
        hashed, "_hkey", id_col=id_col, window=k + 1, num_ranges=num_ranges
    )


def estimate_u(
    levels: DataFrame, features: list[str], n_levels: dict[str, int]
) -> tuple[tuple[float, ...], ...]:
    """Per-feature level distributions over a RANDOM-pair comparison
    table = the unbiased u-probabilities (at realistic match prevalence,
    a uniform random pair is a non-match with probability ≈ 1; the
    O(lambda) contamination is the standard, documented approximation).
    One bounded pattern aggregate, marginalized driver-side. Feed the
    result to ``em_fit(..., fixed_u=...)`` over the BLOCKED pairs — the
    blocked sample is the right place to learn m (it is match-dense) and
    the wrong place to learn u (selection bias), so each distribution is
    estimated where it is identifiable."""
    rows = [
        (tuple(int(r[f"gamma_{f}"]) for f in features), int(r["n"]))
        for r in pattern_counts(levels, features).collect()  # bounded
    ]
    rows.sort()
    total = sum(n for _, n in rows)
    if total == 0:
        raise ValueError("estimate_u needs at least one pair")
    L = [n_levels[f] for f in features]
    u = [[0.0] * L[k] for k in range(len(features))]
    for gamma, n in rows:
        for k in range(len(features)):
            u[k][gamma[k]] += n
    return tuple(
        tuple(x / total for x in row) for row in u
    )


# --------------------------------------------------------------------------
# lambda from deterministic rules (Splink's
# estimate_probability_two_random_records_match_from_deterministic_rules)
# --------------------------------------------------------------------------

def estimate_lambda_deterministic(
    records: DataFrame,
    rules: list[list[str]],
    recall: float = 1.0,
) -> float:
    """Prior match probability lambda from high-precision deterministic
    equality rules — the third leg of the Splink training recipe (u from
    random pairs, m from EM, lambda from deterministic rules): count the
    record pairs matched by ANY rule, divide by the pairs the rules can
    see (``recall`` discounts the matches the rules are known to miss),
    over C(N, 2) possible pairs.

    Each rule is a list of columns whose EQUALITY (non-null) declares a
    match. The union count uses inclusion-exclusion over rule subsets —
    pairs agreeing on rules i and j simultaneously agree on the UNION of
    their key columns — so the whole estimate is 2^R - 1 bounded
    ``sum C(n, 2)`` group aggregates and NEVER materializes a pair: the
    group-size arithmetic of blocking_quality's gold-pair count, applied
    to rule keys. R is 2-4 in practice; group sizes don't matter (no
    join, no explode), so a stock value like a common surname costs the
    same as a unique key. Exact integers everywhere; one float division
    at the end."""
    if not rules or any(not r for r in rules):
        raise ValueError("rules must be a non-empty list of non-empty column lists")
    if not (0.0 < recall <= 1.0):
        raise ValueError(f"recall must be in (0, 1], got {recall}")

    def pairs_on(cols: list[str]) -> int:
        # exact integer C(n,2): n*(n-1) DIV 2 stays in long arithmetic —
        # a double division here would lose exactness past 2^53 pairs
        grouped = (
            records.na.drop(subset=cols)
            .groupBy(*cols)
            .agg(F.count("*").alias("_n"))
            .groupBy()
            .agg(
                F.sum((F.col("_n") * (F.col("_n") - F.lit(1)))).alias("_p")
            )
            .collect()  # single row
        )
        v = grouped[0]["_p"]
        return int(v) // 2 if v is not None else 0

    from itertools import combinations

    n_total = records.count()
    possible = n_total * (n_total - 1) // 2
    if possible == 0:
        raise ValueError("need at least two records")
    matched = 0
    for size in range(1, len(rules) + 1):
        sign = 1 if size % 2 == 1 else -1
        for subset in combinations(range(len(rules)), size):
            union_cols = sorted({c for i in subset for c in rules[i]})
            matched += sign * pairs_on(union_cols)
    lam = matched / recall / possible
    return min(max(lam, 0.0), 1.0)


def fs_parameter_table(spark, params: FSParams) -> DataFrame:
    """The fitted model as an audit table — (feature, level, m, u,
    log2_bf), one row per (feature, level): the tabular form of Splink's
    m/u parameter chart, joinable against fs_explain output so a reviewer
    can see WHICH learned weight a decision used. Driver-side literals
    (the params are already driver-resident); bounded rows."""
    rows = [
        (f, l, params.m[k][l], params.u[k][l], params.log2_bf(k, l))
        for k, f in enumerate(params.features)
        for l in range(params.n_levels[k])
    ]
    return spark.createDataFrame(
        rows, "feature string, level int, m double, u double, log2_bf double"
    )


def review_queue(
    scored_fs: DataFrame,
    bands: list[float],
    per_band: int,
    id_cols: tuple[str, str] = ("skey_a", "skey_b"),
    posterior_col: str = "fs_posterior",
    salt: str = "review",
) -> DataFrame:
    """Deterministic clerical-review sample: the ambiguous middle of the
    posterior distribution is where human labels buy the most model
    improvement, so stratify pairs into posterior bands and take
    ``per_band`` per band — ordered by md5(salt ‖ pair key), so the queue
    is uniform WITHIN a band, identical across reruns, and grows stably
    as data arrives (no Python RNG, no collect).

    Scale shape: a band-partitioned row_number looks like the classic
    low-cardinality window skew (every pair funneled through <= n_bands
    sort tasks), but the ``review_rank <= per_band`` filter right above
    it lets Catalyst's rank-limit pushdown insert a MAP-SIDE
    WindowGroupLimit below the exchange (verified in the plan:
    Sort -> WindowGroupLimit -> Exchange -> Sort -> WindowGroupLimit ->
    Window) — each input task ships at most per_band rows per band, so
    the band-keyed shuffle moves n_tasks * n_bands * per_band rows, not
    the pair table. The hand-rolled two-phase top-k would add a second
    exchange for the same trim. Output: band_lo/band_hi, review_rank,
    and the pair row."""
    if sorted(bands) != list(bands) or len(bands) < 2:
        raise ValueError(f"bands must be >= 2 ascending edges: {bands}")
    a, b = id_cols
    band_idx: Column = F.lit(None).cast("int")
    for i in range(len(bands) - 1):
        cond = (F.col(posterior_col) >= bands[i]) & (
            (F.col(posterior_col) < bands[i + 1])
            if i < len(bands) - 2
            else (F.col(posterior_col) <= bands[i + 1])
        )
        band_idx = F.when(cond, i).otherwise(band_idx)
    lo = F.element_at(
        F.array(*[F.lit(float(x)) for x in bands[:-1]]), F.col("_band") + 1
    )
    hi = F.element_at(
        F.array(*[F.lit(float(x)) for x in bands[1:]]), F.col("_band") + 1
    )
    from pyspark.sql.window import Window

    order_key = F.md5(
        F.concat_ws("\x1f", F.lit(salt), F.col(a).cast("string"),
                    F.col(b).cast("string"))
    )
    banded = (
        scored_fs.withColumn("_band", band_idx)
        .where(F.col("_band").isNotNull())
        .withColumn("_rkey", order_key)
    )
    # the rank<=k filter directly over the window is what triggers the
    # map-side WindowGroupLimit — keep them adjacent
    w = Window.partitionBy("_band").orderBy("_rkey")
    return (
        banded.withColumn("review_rank", F.row_number().over(w))
        .where(F.col("review_rank") <= per_band)
        .drop("_rkey")
        .withColumn("band_lo", lo)
        .withColumn("band_hi", hi)
        .drop("_band")
    )


def train_fs_unsupervised(
    records: DataFrame,
    levels_blocked: DataFrame,
    levels_random: DataFrame,
    thresholds: dict[str, list[float]],
    det_rules: list[list[str]],
    recall: float = 1.0,
    n_iter: int = 30,
) -> tuple[FSParams, FSParams]:
    """The full unsupervised Splink training session, composed from the
    three estimators that are each identifiable in a different pair
    population (the point of the recipe — no single sample can estimate
    all three):

      lambda — ``estimate_lambda_deterministic`` over the RECORDS
               (high-precision equality rules, inclusion-exclusion
               arithmetic, no pairs materialized);
      u      — ``estimate_u`` over RANDOM pairs (uniform pairs are
               non-matches at realistic prevalence; blocked pairs
               over-represent agreeing non-matches and would bias u up);
      m      — ``em_fit(fixed_u=...)`` over BLOCKED pairs (match-dense,
               so the m side of the mixture is identifiable there; the
               EM's own lambda is the BLOCKED prevalence, a property of
               the blocking scheme, not the population).

    Returns ``(population, blocked)``: ``population`` carries the fitted
    m/u with lambda replaced by the deterministic-rule estimate — the
    params whose posterior answers the population-calibrated question
    and whose prior survives a blocking-scheme change; ``blocked`` is
    the raw EM fit (its lambda = candidate-set prevalence — the right
    prior when scoring only within the same blocking scheme). Both
    inherit every determinism guarantee of the parts (exact-integer
    aggregates, canonical sorts): reruns are bit-identical.

    ``levels_blocked`` / ``levels_random``: comparison_levels output over
    the respective pair samples. Fails loudly when the deterministic
    rules match nothing — a prior of 0 calibrates nothing."""
    import dataclasses

    features = list(thresholds)
    n_levels = {f: len(t) + 1 for f, t in thresholds.items()}
    lam = estimate_lambda_deterministic(records, det_rules, recall)
    if lam <= 0.0:
        raise ValueError(
            "deterministic rules matched no pairs; cannot calibrate a prior"
        )
    u = estimate_u(levels_random, features, n_levels)
    blocked = em_fit(
        pattern_counts(levels_blocked, features),
        features,
        n_levels,
        n_iter=n_iter,
        fixed_u=u,
    )
    population = dataclasses.replace(blocked, lam=lam)
    return population, blocked

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
) -> FSParams:
    """EM under conditional independence on the aggregated pattern table.

    ``patterns``: the pattern_counts output (collected here — it is at
    most prod(n_levels) rows by construction) or an already-collected
    list of Rows/tuples. Initialization is fixed and deterministic
    (m mass ramps toward high levels, u toward low), iteration count is
    fixed, and all arithmetic is driver-side Python floats over exact
    integer counts — reruns reproduce the parameters bit-for-bit.
    Labels are never used: this is the unsupervised half of the audit
    story (compare the learned weights against silver labels in tests)."""
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


def fs_score(levels: DataFrame, params: FSParams) -> DataFrame:
    """Attach ``fs_weight`` (prior log-odds + sum of per-feature log2
    Bayes factors) and ``fs_posterior`` (= sigmoid in base 2). The fitted
    parameters enter as LITERALS in chained when-expressions — the whole
    scoring stage is Catalyst arithmetic inside whole-stage codegen: no
    join, no UDF, no shuffle."""
    weight: Column = F.lit(float(params.prior_odds_log2))
    for k, feat in enumerate(params.features):
        col = F.col(f"gamma_{feat}")
        expr: Column = F.lit(float(params.log2_bf(k, 0)))
        for l in range(1, params.n_levels[k]):
            expr = F.when(col == l, float(params.log2_bf(k, l))).otherwise(expr)
        weight = weight + expr
    out = levels.withColumn("fs_weight", weight)
    return out.withColumn(
        "fs_posterior",
        F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -F.col("fs_weight"))),
    )


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

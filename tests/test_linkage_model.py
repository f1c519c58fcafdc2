"""Fellegi-Sunter / EM linkage model (operators/linkage_model.py): exact
pattern counting, deterministic EM, codegen scoring parity with the
closed-form Python model, parameter recovery on a known generative
process, and unsupervised separation on the real scorer's output."""

import math
import random
from collections import Counter

import pyspark.sql.functions as F
import pytest

from entity_linkings_spark.operators.linkage_model import (
    FSParams,
    comparison_levels,
    em_fit,
    fit_fs_model,
    fs_score,
    pattern_counts,
)


def _py_em(rows, K, L, n_iter=30, init_lambda=0.1):
    """Independent re-statement of the EM recurrence (not shared code)."""
    def ramp(nl, up):
        raw = [(l + 1.0) if up else (nl - l) for l in range(nl)]
        s = sum(raw)
        return [x / s for x in raw]

    lam = init_lambda
    m = [ramp(L[k], True) for k in range(K)]
    u = [ramp(L[k], False) for k in range(K)]
    total = sum(n for _, n in rows)
    for _ in range(n_iter):
        post = []
        for g, n in rows:
            pm, pu = lam, 1 - lam
            for k in range(K):
                pm *= m[k][g[k]]
                pu *= u[k][g[k]]
            post.append(pm / (pm + pu) if pm + pu > 0 else 0.0)
        wm = sum(p * n for p, (_, n) in zip(post, rows))
        wu = total - wm
        lam = wm / total
        nm = [[0.0] * L[k] for k in range(K)]
        nu = [[0.0] * L[k] for k in range(K)]
        for p, (g, n) in zip(post, rows):
            for k in range(K):
                nm[k][g[k]] += p * n
                nu[k][g[k]] += (1 - p) * n
        m = [[nm[k][l] / wm if wm > 0 else 1 / L[k] for l in range(L[k])]
             for k in range(K)]
        u = [[nu[k][l] / wu if wu > 0 else 1 / L[k] for l in range(L[k])]
             for k in range(K)]
    return lam, m, u


def test_pattern_counts_exact_and_em_input_equivalence(spark):
    """Spark pattern aggregation == Counter over the same rows, and em_fit
    gives bit-identical parameters whether fed the DataFrame or the
    collected list — the distributed step is exact integer counting."""
    rng = random.Random(7)
    data = [(rng.uniform(0, 1), rng.uniform(0, 1)) for _ in range(500)]
    df = spark.createDataFrame(data, "jw double, nj double")
    ths = {"jw": [0.5, 0.9], "nj": [0.7]}
    lev = comparison_levels(df, ths)
    got = {(r["gamma_jw"], r["gamma_nj"]): r["n"]
           for r in pattern_counts(lev, ["jw", "nj"]).collect()}
    want = Counter(
        (sum(v >= t for t in ths["jw"]), sum(w >= t for t in ths["nj"]))
        for v, w in data
    )
    assert got == dict(want)
    nl = {"jw": 3, "nj": 2}
    p_df = em_fit(pattern_counts(lev, ["jw", "nj"]), ["jw", "nj"], nl)
    p_list = em_fit([(g, n) for g, n in want.items()], ["jw", "nj"], nl)
    assert p_df == p_list  # dataclass equality = bit-identical floats


def test_em_matches_independent_python_model(spark):
    """em_fit == an independently written EM recurrence on the same
    pattern table (same init convention), to 1e-12."""
    rng = random.Random(3)
    rows = [((rng.randint(0, 2), rng.randint(0, 1)), rng.randint(1, 50))
            for _ in range(30)]
    agg = Counter()
    for g, n in rows:
        agg[g] += n
    rows = sorted(agg.items())
    params = em_fit(rows, ["a", "b"], {"a": 3, "b": 2})
    lam, m, u = _py_em(rows, 2, [3, 2])
    assert params.lam == pytest.approx(lam, abs=1e-12)
    for k in range(2):
        for l in range([3, 2][k]):
            assert params.m[k][l] == pytest.approx(m[k][l], abs=1e-12)
            assert params.u[k][l] == pytest.approx(u[k][l], abs=1e-12)


def test_em_recovers_generative_parameters():
    """Pairs drawn from a known Fellegi-Sunter process (lambda = 0.2,
    separated m/u, THREE conditionally independent features — the classic
    identifiability minimum; with two the likelihood surface is flat
    enough that lambda drifts ~0.02-0.03): EM recovers lambda and the
    per-level conditionals within sampling tolerance, and the
    posterior-0.5 rule reproduces the Bayes-optimal classification of
    every pattern."""
    rng = random.Random(42)
    LAM = 0.2
    M = [[0.05, 0.15, 0.80], [0.10, 0.90], [0.20, 0.80]]
    U = [[0.70, 0.25, 0.05], [0.85, 0.15], [0.75, 0.25]]
    NL = [3, 2, 2]

    def draw(dist):
        x, acc = rng.random(), 0.0
        for i, p in enumerate(dist):
            acc += p
            if x < acc:
                return i
        return len(dist) - 1

    agg = Counter()
    for _ in range(40000):
        is_m = rng.random() < LAM
        g = tuple(draw((M if is_m else U)[k]) for k in range(3))
        agg[g] += 1
    rows = sorted(agg.items())
    params = em_fit(rows, ["a", "b", "c"], {"a": 3, "b": 2, "c": 2},
                    n_iter=200)
    assert params.lam == pytest.approx(LAM, abs=0.02)
    for k, nl in enumerate(NL):
        for l in range(nl):
            assert params.m[k][l] == pytest.approx(M[k][l], abs=0.05)
            assert params.u[k][l] == pytest.approx(U[k][l], abs=0.05)
    # Bayes agreement on every observed pattern
    for g, _ in rows:
        true_pm = LAM
        true_pu = 1 - LAM
        for k in range(3):
            true_pm *= M[k][g[k]]
            true_pu *= U[k][g[k]]
        w = params.prior_odds_log2 + sum(
            params.log2_bf(k, g[k]) for k in range(3)
        )
        assert (w > 0) == (true_pm > true_pu), g


def test_fs_score_expression_matches_closed_form(spark):
    """The chained-when literal expression computes exactly the Python
    closed form for every pattern — the scoring stage is pure Catalyst
    arithmetic (plan asserted join- and python-free)."""
    params = FSParams(
        features=("a", "b"),
        n_levels=(3, 2),
        lam=0.25,
        m=((0.1, 0.2, 0.7), (0.15, 0.85)),
        u=((0.6, 0.3, 0.1), (0.9, 0.1)),
        n_iter=0,
        delta=0.0,
    )
    pats = [(i, j) for i in range(3) for j in range(2)]
    df = spark.createDataFrame(pats, "gamma_a int, gamma_b int")
    got = {(r["gamma_a"], r["gamma_b"]): (r["fs_weight"], r["fs_posterior"])
           for r in fs_score(df, params).collect()}
    for i, j in pats:
        w = params.prior_odds_log2 + params.log2_bf(0, i) + params.log2_bf(1, j)
        post = 1.0 / (1.0 + 2.0 ** -w)
        assert got[(i, j)][0] == pytest.approx(w, abs=1e-9)
        assert got[(i, j)][1] == pytest.approx(post, abs=1e-9)
    plan = fs_score(df, params)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan


def test_fs_separates_real_scored_pairs_unsupervised(spark, tiny):
    """End to end on the REAL scorer's candidate pairs (tiny corpus):
    weights learned WITHOUT labels, classified at the UNTUNED posterior
    0.5, match or beat the hand-fixed blend on the silver-labeled pairs.
    The silver positives include abbreviation variants ("a. tanaka") that
    NO pure string-feature rule separates from cross-entity near-misses —
    that ceiling is why the shipping path is resolution-first — so the
    honest gate is FS-vs-blend, not absolute accuracy: at posterior 0.5
    the learned model reproduces the blend's best operating point
    (combined >= 0.80: same tp/fp/fn triple on this corpus) and far
    exceeds the blend at the calibrated 0.90 match threshold, with no
    labels and no threshold search."""
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    pipe = LinkagePipeline(tiny["dictionary"])
    surfaces = pipe.surfaces(pipe.mentions(tiny["transcripts"])).cache()
    scored = pipe.scored_pairs(
        pipe.pairs(surfaces, pipe.surface_keys(surfaces)), surfaces
    ).localCheckpoint()
    ths = {
        "jaro_winkler": [0.80, 0.94],
        "lev_ratio": [0.60, 0.90],
        "ngram_jaccard": [0.30, 0.70],
    }
    out, params = fit_fs_model(scored, ths)
    assert 0.0 < params.lam < 1.0 and params.delta < 1e-3  # converged
    rows = out.where(
        F.col("ent_a").isNotNull() & F.col("ent_b").isNotNull()
    ).select(
        (F.col("ent_a") == F.col("ent_b")).alias("is_same"),
        "fs_posterior",
        "combined",
    ).collect()

    def prf(pred):
        tp = sum(1 for r in rows if r["is_same"] and pred(r))
        fp = sum(1 for r in rows if not r["is_same"] and pred(r))
        fn = sum(1 for r in rows if r["is_same"] and not pred(r))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        return prec, rec, f1

    fs = prf(lambda r: r["fs_posterior"] > 0.5)
    blend_ship = prf(lambda r: r["combined"] >= 0.90)  # shipping threshold
    assert fs[2] >= blend_ship[2] + 0.2, (fs, blend_ship)  # 0.56 vs 0.263
    assert fs[0] >= 0.8 and fs[2] >= 0.5, fs
    # learned evidence is ordered: higher agreement level => larger
    # log2 Bayes factor for every feature, without any label seeing it
    for k in range(len(params.features)):
        bfs = [params.log2_bf(k, l) for l in range(params.n_levels[k])]
        assert bfs == sorted(bfs), (params.features[k], bfs)

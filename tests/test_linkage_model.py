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
    fs_explain,
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


def test_fs_explain_waterfall_sums_exactly(spark):
    """prior_log2_odds + sum(bf_*) == fs_weight BIT-exactly (same literal
    expressions, same addition order as fs_score), for every pattern —
    and the explain projection stays join- and Python-free."""
    params = FSParams(
        features=("a", "b", "c"),
        n_levels=(3, 2, 2),
        lam=0.2,
        m=((0.05, 0.15, 0.8), (0.1, 0.9), (0.2, 0.8)),
        u=((0.7, 0.25, 0.05), (0.85, 0.15), (0.75, 0.25)),
        n_iter=0,
        delta=0.0,
    )
    pats = [(i, j, k) for i in range(3) for j in range(2) for k in range(2)]
    df = spark.createDataFrame(pats, "gamma_a int, gamma_b int, gamma_c int")
    exp = fs_explain(df, params)
    base = {
        (r["gamma_a"], r["gamma_b"], r["gamma_c"]): r["fs_weight"]
        for r in fs_score(df, params).collect()
    }
    for r in exp.collect():
        key = (r["gamma_a"], r["gamma_b"], r["gamma_c"])
        parts = r["prior_log2_odds"] + r["bf_a"] + r["bf_b"] + r["bf_c"]
        assert r["fs_weight"] == parts  # bit-exact, not approx
        assert r["fs_weight"] == base[key]
        for k, feat in enumerate(("a", "b", "c")):
            assert r[f"bf_{feat}"] == pytest.approx(
                params.log2_bf(k, key[k]), abs=0
            )
    plan = exp._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan


def test_term_frequencies_and_agreement_u(spark):
    """tf is the exact rational count/total over non-null values;
    agreement_u == sum of tf^2."""
    from entity_linkings_spark.operators.linkage_model import (
        agreement_u,
        term_frequencies,
    )

    vals = ["x"] * 5 + ["y"] * 3 + ["z"] * 2 + [None]
    df = spark.createDataFrame([(v,) for v in vals], "surface string")
    tf = term_frequencies(df, "surface")
    got = {r["value"]: (r["n"], r["tf"]) for r in tf.collect()}
    assert got == {
        "x": (5, 0.5),
        "y": (3, 0.3),
        "z": (2, 0.2),
    }
    assert agreement_u(tf) == pytest.approx(0.25 + 0.09 + 0.04, abs=1e-12)


def test_tf_adjustment_matches_closed_form(spark):
    """The adjustment column equals log2(u_bar / tf(v)) exactly where the
    pair agrees at the top level, 0 elsewhere; rare values gain weight,
    stock values lose it; fs_weight_tf = fs_weight + adjustment."""
    import math as _math

    from entity_linkings_spark.operators.linkage_model import (
        agreement_u,
        term_frequencies,
        tf_adjusted_score,
    )

    corpus = spark.createDataFrame(
        [("john",)] * 8 + [("zanzibar",)] * 2, "surface string"
    )
    tf = term_frequencies(corpus, "surface")
    u_bar = agreement_u(tf)  # 0.64 + 0.04 = 0.68
    assert u_bar == pytest.approx(0.68, abs=1e-12)
    params = FSParams(
        features=("sim",),
        n_levels=(2,),
        lam=0.1,
        m=((0.2, 0.8),),
        u=((0.9, 0.1),),
        n_iter=0,
        delta=0.0,
    )
    pairs = spark.createDataFrame(
        [
            ("john", "john", 1),       # common exact agreement: negative adj
            ("zanzibar", "zanzibar", 1),  # rare exact agreement: positive adj
            ("john", "zanzibar", 1),   # top level but unequal strings: 0
            ("john", "john", 0),       # equal strings below top level: 0
        ],
        "surface_a string, surface_b string, gamma_sim int",
    )
    out = tf_adjusted_score(
        fs_score(pairs, params), params, "sim", tf, u_bar=u_bar
    ).collect()
    by = {(r["surface_a"], r["surface_b"], r["gamma_sim"]): r for r in out}
    j = by[("john", "john", 1)]
    z = by[("zanzibar", "zanzibar", 1)]
    assert j["tf_adj_sim"] == pytest.approx(_math.log2(0.68 / 0.8), abs=1e-12)
    assert z["tf_adj_sim"] == pytest.approx(_math.log2(0.68 / 0.2), abs=1e-12)
    assert j["tf_adj_sim"] < 0 < z["tf_adj_sim"]
    assert by[("john", "zanzibar", 1)]["tf_adj_sim"] == 0.0
    assert by[("john", "john", 0)]["tf_adj_sim"] == 0.0
    for r in out:
        assert r["fs_weight_tf"] == pytest.approx(
            r["fs_weight"] + r["tf_adj_sim"], abs=1e-12
        )
        want_post = 1.0 / (1.0 + 2.0 ** -r["fs_weight_tf"])
        assert r["fs_posterior_tf"] == pytest.approx(want_post, abs=1e-12)


def test_random_comparison_pairs_deterministic_and_hash_ordered(spark):
    """Exactly k*N - k(k+1)/2 pairs, no self-pairs, identical across
    reruns (md5 order), DIFFERENT under a different salt, and not the
    consecutive-id pairing (the hash actually shuffles)."""
    from entity_linkings_spark.operators.linkage_model import (
        random_comparison_pairs,
    )

    n, k = 200, 2
    df = spark.createDataFrame([(f"id{i:04d}",) for i in range(n)], "skey string")
    p1 = {(r["skey_a"], r["skey_b"]) for r in
          random_comparison_pairs(df, "skey", k=k).collect()}
    p2 = {(r["skey_a"], r["skey_b"]) for r in
          random_comparison_pairs(df, "skey", k=k).collect()}
    p3 = {(r["skey_a"], r["skey_b"]) for r in
          random_comparison_pairs(df, "skey", salt="other", k=k).collect()}
    assert p1 == p2
    assert p1 != p3
    assert len(p1) == k * n - k * (k + 1) // 2
    assert all(a != b for a, b in p1)
    consecutive = {(f"id{i:04d}", f"id{i+1:04d}") for i in range(n - 1)}
    assert len(p1 & consecutive) < len(consecutive) // 2


def test_estimate_u_and_fixed_u_em_restores_identifiability():
    """The production recipe: u measured on random pairs (recovers the
    true generative U to sampling error), then em_fit(fixed_u=...) on the
    candidate pairs. The regime where this MATTERS is few features: with
    two conditionally independent features the free-EM likelihood surface
    is nearly flat (the 3-feature recovery test documents the classic
    identifiability minimum), so free EM drifts on lambda and m even on
    an UNBIASED sample — anchoring u from the random-pair estimate
    restores identifiability: m error drops ~30x on the same data."""
    rng = random.Random(11)
    LAM = 0.25
    M = [[0.05, 0.15, 0.80], [0.10, 0.90]]
    U = [[0.70, 0.25, 0.05], [0.85, 0.15]]

    def draw(dist):
        x, acc = rng.random(), 0.0
        for i, p in enumerate(dist):
            acc += p
            if x < acc:
                return i
        return len(dist) - 1

    # random pairs are (to O(lambda_population), here exactly) non-matches
    rnd = Counter()
    for _ in range(30000):
        rnd[tuple(draw(U[kk]) for kk in range(2))] += 1
    total = sum(rnd.values())
    u_hat = []
    for kk, nl in enumerate([3, 2]):
        hist = [0] * nl
        for g, n in rnd.items():
            hist[g[kk]] += n
        u_hat.append(tuple(h / total for h in hist))
    for kk in range(2):
        for l in range(len(U[kk])):
            assert u_hat[kk][l] == pytest.approx(U[kk][l], abs=0.02)

    blocked = Counter()
    for _ in range(40000):
        src_dist = M if rng.random() < LAM else U
        blocked[tuple(draw(src_dist[kk]) for kk in range(2))] += 1
    rows = sorted(blocked.items())
    nl = {"a": 3, "b": 2}
    fixed = em_fit(rows, ["a", "b"], nl, n_iter=200,
                   fixed_u=tuple(tuple(r) for r in u_hat))
    free = em_fit(rows, ["a", "b"], nl, n_iter=200)
    assert fixed.u == tuple(tuple(r) for r in u_hat)  # u untouched

    def m_err(p):
        return max(
            abs(p.m[kk][l] - M[kk][l])
            for kk in range(2) for l in range(len(M[kk]))
        )

    # measured on this seed: fixed 0.0025 / free 0.075, lam 0.249 / 0.215
    assert m_err(fixed) < 0.02, m_err(fixed)
    assert abs(fixed.lam - LAM) < 0.02, fixed.lam
    assert m_err(fixed) < m_err(free) / 3, (m_err(fixed), m_err(free))
    assert abs(fixed.lam - LAM) < abs(free.lam - LAM), (fixed.lam, free.lam)


def test_fixed_u_recipe_end_to_end_on_real_pairs(spark, tiny):
    """Full production recipe on the real corpus, in its natural habitat
    — a dedup-style pair population (uniform random pairs plus the
    planted same-entity pairs) where matches are RARE: deterministic
    random pairs -> score -> estimate_u, then EM with u fixed. At the
    untuned posterior 0.5 the fit separates the silver labels at
    F1 >= 0.9 and is never worse than free EM on the same population.

    Deliberate boundary (measured, not asserted here): running fixed-u
    EM on heavily BLOCKED candidates instead makes lambda absorb the
    co-blocked similarity (0.95 on this corpus) and posterior 0.5
    over-links — candidate pairs are similar by construction, so the
    population-random u is the wrong yardstick for them. Classifying
    within blocked candidates is free EM's regime (the previous test);
    population-calibrated posteriors are fixed-u's regime (this one)."""
    from entity_linkings_spark.operators.linkage_model import (
        estimate_u,
        random_comparison_pairs,
    )
    from entity_linkings_spark.operators.scoring import score_pairs
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    pipe = LinkagePipeline(tiny["dictionary"])
    surfaces = pipe.surfaces(pipe.mentions(tiny["transcripts"])).cache()
    ths = {
        "jaro_winkler": [0.80, 0.94],
        "lev_ratio": [0.60, 0.90],
        "ngram_jaccard": [0.30, 0.70],
    }
    nl = {f: len(t) + 1 for f, t in ths.items()}
    surf = surfaces.select("skey", "surface", "prior_entity")

    def attach(p):
        return p.join(
            surf.withColumnsRenamed({"skey": "skey_a", "surface": "surface_a",
                                     "prior_entity": "ent_a"}), "skey_a"
        ).join(
            surf.withColumnsRenamed({"skey": "skey_b", "surface": "surface_b",
                                     "prior_entity": "ent_b"}), "skey_b"
        )

    u_hat = estimate_u(
        comparison_levels(
            score_pairs(attach(
                random_comparison_pairs(surfaces, "skey", salt="u", k=2)
                .drop("gap"))),
            ths,
        ),
        list(ths), nl,
    )
    # random pairs are overwhelmingly non-matches: every feature's top
    # agreement level must be rare under u
    for k, feat in enumerate(ths):
        assert u_hat[k][nl[feat] - 1] < 0.05, (feat, u_hat[k])

    ent = surf.where(F.col("prior_entity").isNotNull())
    same = (
        ent.alias("a")
        .join(ent.alias("b"),
              F.col("a.prior_entity") == F.col("b.prior_entity"))
        .where(F.col("a.skey") < F.col("b.skey"))
        .select(
            F.col("a.skey").alias("skey_a"), F.col("b.skey").alias("skey_b"),
            F.col("a.surface").alias("surface_a"),
            F.col("b.surface").alias("surface_b"),
            F.col("a.prior_entity").alias("ent_a"),
            F.col("b.prior_entity").alias("ent_b"),
        )
    )
    pop = (
        attach(random_comparison_pairs(surfaces, "skey", salt="eval", k=2)
               .drop("gap"))
        .select("skey_a", "skey_b", "surface_a", "surface_b",
                "ent_a", "ent_b")
        .unionByName(same)
        .dropDuplicates(["skey_a", "skey_b"])
    )
    levels = comparison_levels(score_pairs(pop), ths).localCheckpoint()
    pc = pattern_counts(levels, list(ths))
    fixed = em_fit(pc, list(ths), nl, fixed_u=u_hat)
    free = em_fit(pc, list(ths), nl)
    assert fixed.u == u_hat  # u is data, not a parameter, in this regime
    assert 0.0 < fixed.lam < 0.5  # matches are the rare class here

    def f1(params):
        rows = fs_score(levels, params).where(
            F.col("ent_a").isNotNull() & F.col("ent_b").isNotNull()
        ).select(
            (F.col("ent_a") == F.col("ent_b")).alias("s"), "fs_posterior"
        ).collect()
        tp = sum(1 for r in rows if r["s"] and r["fs_posterior"] > 0.5)
        fp = sum(1 for r in rows if not r["s"] and r["fs_posterior"] > 0.5)
        fn = sum(1 for r in rows if r["s"] and r["fs_posterior"] <= 0.5)
        p = tp / (tp + fp) if tp + fp else 0.0
        rc = tp / (tp + fn) if tp + fn else 0.0
        return 2 * p * rc / (p + rc) if p + rc else 0.0

    f_fixed, f_free = f1(fixed), f1(free)
    # measured 0.87-0.95 across random-pair salts (the population itself
    # is salt-dependent); both fits land within one pair of each other
    assert f_fixed >= 0.85, f_fixed
    assert f_fixed >= f_free - 0.05, (f_fixed, f_free)


def test_estimate_lambda_deterministic_matches_brute_force(spark):
    """Inclusion-exclusion over rule-key group sizes == brute-force pair
    enumeration, on a corpus with overlapping rules (pairs matched by
    BOTH rules must count once), null keys (can't match), and a stock
    value shared by many records (group size must not matter)."""
    from entity_linkings_spark.operators.linkage_model import (
        estimate_lambda_deterministic,
    )

    rows = []
    # family A: same email AND same phone (overlap between rules)
    for i in range(4):
        rows.append((f"a{i}", "kai@x.zz", "555-01", f"n{i}"))
    # family B: same phone only
    for i in range(3):
        rows.append((f"b{i}", f"b{i}@y.zz", "555-02", "pat lee"))
    # family C: same (zip-ish) name only — the stock value
    for i in range(6):
        rows.append((f"c{i}", f"c{i}@z.zz", f"555-1{i}", "alex kim"))
    # nulls: never match on the null column
    rows.append(("n0", None, "555-02", None))
    rows.append(("n1", None, None, "alex kim"))
    df = spark.createDataFrame(
        rows, "skey string, email string, phone string, name string"
    )
    rules = [["email"], ["phone"], ["name"]]

    # brute force over the same semantics
    def match(r1, r2):
        return any(
            all(r1[c] is not None and r1[c] == r2[c] for c in rule)
            for rule in rules
        )

    import itertools

    matched = sum(
        1 for r1, r2 in itertools.combinations(rows, 2)
        if match(dict(zip(["skey", "email", "phone", "name"], r1)),
                 dict(zip(["skey", "email", "phone", "name"], r2)))
    )
    n = len(rows)
    want = matched / (n * (n - 1) / 2)
    got = estimate_lambda_deterministic(df, rules)
    assert got == pytest.approx(want, abs=1e-12)
    # recall discounts: rules that miss half the matches → lambda doubles
    assert estimate_lambda_deterministic(df, rules, recall=0.5) == pytest.approx(
        min(2 * want, 1.0), abs=1e-12
    )
    # a multi-column rule: email AND phone both equal — strictly fewer pairs
    tight = estimate_lambda_deterministic(df, [["email", "phone"]])
    assert 0 < tight < estimate_lambda_deterministic(df, [["email"]]) + 1e-15
    with pytest.raises(ValueError):
        estimate_lambda_deterministic(df, [])
    with pytest.raises(ValueError):
        estimate_lambda_deterministic(df, rules, recall=0.0)


def test_fs_parameter_table_and_review_queue(spark):
    """fs_parameter_table rows == the fitted params exactly; review_queue
    is stratified (per_band cap per posterior band), deterministic across
    reruns AND repartitioning (md5 order, no RNG), selects the same pairs
    the Python md5 model selects, and band edges are honest (interior
    edges go up, the last band includes its right edge)."""
    from entity_linkings_spark.operators.linkage_model import (
        fs_parameter_table,
        review_queue,
    )

    ths = {"jw": [0.7, 0.9], "tok": [0.5]}
    random.seed(8)
    pairs = []
    for i in range(120):
        is_m = i % 3 == 0
        jw = random.uniform(0.85, 1.0) if is_m else random.uniform(0.0, 0.8)
        tk = random.uniform(0.5, 1.0) if is_m else random.uniform(0.0, 0.6)
        pairs.append((f"L{i}", f"R{i}", jw, tk))
    df = spark.createDataFrame(
        pairs, "skey_a string, skey_b string, jw double, tok double"
    )
    scored, params = fit_fs_model(df, ths)

    tbl = {
        (r["feature"], r["level"]): (r["m"], r["u"], r["log2_bf"])
        for r in fs_parameter_table(spark, params).collect()
    }
    assert len(tbl) == sum(params.n_levels)
    for k, f in enumerate(params.features):
        for l in range(params.n_levels[k]):
            assert tbl[(f, l)] == (
                params.m[k][l], params.u[k][l], params.log2_bf(k, l)
            )

    bands = [0.0, 0.25, 0.75, 1.0]
    q = review_queue(scored, bands, per_band=5)
    got = [(r["skey_a"], r["skey_b"], r["band_lo"], r["band_hi"],
            r["review_rank"], r["fs_posterior"]) for r in q.collect()]
    # stratified: <= 5 per band, ranks 1..n, posterior inside the band
    from collections import defaultdict
    by_band = defaultdict(list)
    for a, b, lo, hi, rk, p in got:
        by_band[(lo, hi)].append((rk, a, b))
        assert lo <= p and (p < hi or (hi == bands[-1] and p <= hi))
    for (lo, hi), members in by_band.items():
        assert len(members) <= 5
        assert sorted(rk for rk, _, _ in members) == list(
            range(1, len(members) + 1)
        )
    # python md5 model picks the same pairs per band
    import hashlib
    post = {(r["skey_a"], r["skey_b"]): r["fs_posterior"]
            for r in scored.collect()}
    model = defaultdict(list)
    for (a, b), p in post.items():
        bi = None
        for i in range(len(bands) - 1):
            if bands[i] <= p and (p < bands[i + 1] or i == len(bands) - 2
                                  and p <= bands[i + 1]):
                bi = i
                break
        if bi is None:
            continue
        key = hashlib.md5(f"review\x1f{a}\x1f{b}".encode()).hexdigest()
        model[bi].append((key, a, b))
    want = set()
    for bi, items in model.items():
        for _, a, b in sorted(items)[:5]:
            want.add((a, b))
    assert {(a, b) for a, b, *_ in got} == want
    # deterministic across repartitioning
    q2 = review_queue(scored.repartition(7), bands, per_band=5)
    assert {(r["skey_a"], r["skey_b"], r["review_rank"])
            for r in q2.collect()} == {(a, b, rk) for a, b, _, _, rk, _ in got}
    with pytest.raises(ValueError):
        review_queue(scored, [0.5], per_band=1)


def test_train_fs_unsupervised_full_recipe(spark):
    """The composed training session on a generative corpus with known
    structure: lambda lands exactly on the deterministic-rule arithmetic
    (rule recall 1.0 by construction → the true pair prevalence), u comes
    from the random sample, m from fixed-u EM on the match-dense blocked
    sample — and the population params separate match from non-match
    pairs at the untuned 0.5 posterior. Reruns are bit-identical; a rule
    set matching nothing fails loudly."""
    from entity_linkings_spark.operators.linkage_model import (
        comparison_levels,
        fs_score,
        random_comparison_pairs,
        train_fs_unsupervised,
    )

    random.seed(80)
    # 40 entities x 3 records; every family shares one email (det rule
    # catches every true pair -> recall 1.0 exactly)
    recs, feats = [], {}
    for e in range(40):
        for c in range(3):
            rid = f"e{e}_{c}"
            recs.append((rid, e, f"fam{e}@x.zz"))
    records = spark.createDataFrame(recs, "skey string, ent int, email string")

    def pair_features(ea, eb):
        if ea == eb:
            return (random.uniform(0.85, 1.0), random.uniform(0.6, 1.0))
        return (random.uniform(0.0, 0.75), random.uniform(0.0, 0.55))

    # blocked sample: all true pairs + 2x agreeing-ish non-matches
    ents = {r[0]: r[1] for r in recs}
    ids = [r[0] for r in recs]
    blocked = []
    for e in range(40):
        fam = [f"e{e}_{c}" for c in range(3)]
        for i in range(3):
            for j in range(i + 1, 3):
                blocked.append((fam[i], fam[j], *pair_features(e, e)))
    for i in range(240):
        a, b = random.sample(ids, 2)
        if ents[a] != ents[b]:
            blocked.append((a, b, *pair_features(ents[a], ents[b])))
    bdf = spark.createDataFrame(
        blocked, "skey_a string, skey_b string, jw double, tok double"
    )
    # random sample via the deterministic hash-order pairer
    rp = random_comparison_pairs(records, id_col="skey", k=2).collect()
    rrows = [
        (r["skey_a"], r["skey_b"],
         *pair_features(ents[r["skey_a"]], ents[r["skey_b"]]))
        for r in rp
    ]
    rdf = spark.createDataFrame(
        rrows, "skey_a string, skey_b string, jw double, tok double"
    )

    ths = {"jw": [0.7, 0.9], "tok": [0.5]}
    pop, blk = train_fs_unsupervised(
        records, comparison_levels(bdf, ths), comparison_levels(rdf, ths),
        ths, det_rules=[["email"]],
    )
    # lambda: exactly sum C(3,2)*40 / C(120,2)
    n = 120
    want_lam = (40 * 3) / (n * (n - 1) / 2)
    assert pop.lam == pytest.approx(want_lam, abs=1e-15)
    # blocked prevalence is far higher than the population prior
    assert blk.lam > 5 * pop.lam
    # m/u shared between the two param sets; only lambda differs
    assert pop.m == blk.m and pop.u == blk.u
    # the blocked-sample posterior at 0.5 separates true from false pairs
    scored = fs_score(comparison_levels(bdf, ths), blk)
    got = [(r["skey_a"], r["skey_b"], r["fs_posterior"]) for r in scored.collect()]
    tp = fp = fn = 0
    for a, b, p in got:
        truth = ents[a] == ents[b]
        if p >= 0.5 and truth:
            tp += 1
        elif p >= 0.5:
            fp += 1
        elif truth:
            fn += 1
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.95, (tp, fp, fn)
    # bit-identical rerun
    pop2, blk2 = train_fs_unsupervised(
        records, comparison_levels(bdf, ths), comparison_levels(rdf, ths),
        ths, det_rules=[["email"]],
    )
    assert pop2 == pop and blk2 == blk
    # loud failure on a no-match rule set
    import pyspark.sql.functions as SF
    nomatch = records.withColumn("email", SF.concat(SF.col("skey"), SF.col("email")))
    with pytest.raises(ValueError, match="matched no pairs"):
        train_fs_unsupervised(
            nomatch, comparison_levels(bdf, ths),
            comparison_levels(rdf, ths), ths, det_rules=[["email"]],
        )

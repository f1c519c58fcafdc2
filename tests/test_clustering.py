"""Connected components vs a plain union-find oracle (the golden-test pattern
of SURVEY.md section 5), including the star-contraction worst case (chain)."""

import random

import pytest

from entity_linkings_spark.operators.clustering import (
    clusters_with_singletons,
    connected_components,
    incremental_components,
)


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    touched = {x for e in edges for x in e}
    comp = {}
    for n in touched:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comp.values() for n in ms}


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("local_threshold", [0, 100_000])  # star loop AND local finish
def test_random_graphs_match_union_find(spark, seed, local_threshold):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(150)]
    edges = [
        (a, b)
        for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(120))
        if a != b
    ]
    edf = spark.createDataFrame(edges, "u string, v string")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edf, local_threshold=local_threshold).collect()
    }
    assert got == _uf(edges)


@pytest.mark.parametrize("local_threshold", [0, 100_000])
def test_chain_worst_case(spark, local_threshold):
    edges = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]
    edf = spark.createDataFrame(edges, "u string, v string")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edf, local_threshold=local_threshold).collect()
    }
    assert set(got.values()) == {"c000"}
    assert len(got) == 61


def test_hybrid_handoff_mid_contraction(spark):
    """A graph large enough to start the star loop but which contracts below
    the threshold after one round must hand off to the local finish with the
    same result as a pure distributed run."""
    rng = random.Random(9)
    nodes = [f"h{i:04d}" for i in range(300)]
    edges = list({
        (min(a, b), max(a, b))
        for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(400))
        if a != b
    })
    edf = spark.createDataFrame(edges, "u string, v string")
    hybrid = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edf, local_threshold=len(edges) - 1).collect()
    }
    assert hybrid == _uf(edges)


def test_empty_edges(spark):
    edf = spark.createDataFrame([], "u string, v string")
    assert connected_components(edf).count() == 0


def test_singletons_fill(spark):
    edges = spark.createDataFrame([("a", "b")], "u string, v string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["node"])
    got = {
        r["node"]: r["cluster_id"]
        for r in clusters_with_singletons(connected_components(edges), nodes).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}


@pytest.mark.parametrize("seed", [3, 4])
def test_incremental_matches_full_recompute(spark, seed):
    """incremental_components(labels(old), delta) == connected_components(
    old ∪ delta) — the cc_incremental contract, over random graphs with
    cross-cluster merges, intra-cluster no-op edges, and fresh nodes."""
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(120)]
    all_edges = [
        (a, b)
        for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(140))
        if a != b
    ]
    # deterministic split: ~1/3 of the edges arrive later (plus edges that
    # introduce brand-new nodes, including a fresh-only pair)
    old = [e for i, e in enumerate(all_edges) if i % 3 != 0]
    delta = [e for i, e in enumerate(all_edges) if i % 3 == 0]
    delta += [("n000", "z900"), ("z901", "z902")]
    labels = connected_components(spark.createDataFrame(old, "u string, v string"))
    got = {
        r["node"]: r["cluster_id"]
        for r in incremental_components(
            labels, spark.createDataFrame(delta, "u string, v string")
        ).collect()
    }
    assert got == _uf(old + delta)


def test_incremental_two_epochs_streaming_shape(spark):
    """VERDICT r4 #4's streaming shape: labels maintained across TWO epochs
    of edge deltas (the per-session-close micro-batches of the sessionization
    path) equal one full recompute over everything — replay-idempotent
    epoch-at-a-time maintenance, never an O(corpus) recluster."""
    epoch0 = [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")]
    epoch1 = [("b", "c"), ("i", "j"), ("e", "e2")]   # merge + fresh + grow
    epoch2 = [("d", "e"), ("a", "a"), ("h", "g")]    # chain merge + self/no-ops
    labels = connected_components(
        spark.createDataFrame(epoch0, "u string, v string")
    )
    for delta in (epoch1, epoch2):
        labels = incremental_components(
            labels, spark.createDataFrame(delta, "u string, v string")
        )
    got = {r["node"]: r["cluster_id"] for r in labels.collect()}
    assert got == _uf([e for e in epoch0 + epoch1 + epoch2 if e[0] != e[1]])


def test_incremental_empty_delta_is_identity(spark):
    base = [("a", "b"), ("c", "d")]
    labels = connected_components(spark.createDataFrame(base, "u string, v string"))
    out = incremental_components(
        labels, spark.createDataFrame([], "u string, v string")
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in labels.collect()}


def test_small_graph_cc_costs_at_most_two_jobs(spark):
    """VERDICT r2 item 4 (job-count cut), pinned with a drift-free metric:
    the small-graph CC entry is ONE action — the limit-collect — plus at
    most the lazy localCheckpoint's backfill job. The previous shape
    (eager checkpoint + fingerprint + collect) cost 3 actions / 4+ jobs."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "u string, v string"
    )
    sc = spark.sparkContext
    j0 = sc._jsc.sc().dagScheduler().nextJobId()
    out = connected_components(edges)  # fast path collects during build
    j1 = sc._jsc.sc().dagScheduler().nextJobId()
    assert j1 - j0 <= 2
    assert out.count() == 5  # result itself is a local createDataFrame


def test_cluster_density_flags_hub_glued_cluster(spark):
    """cluster_density: a star (hub glues 4 leaves) reads density 0.4, a
    4-clique reads 1.0, and a size-2 pair reads 1.0 — the over-merge
    audit's discriminating signal. A size>=2 cluster with ZERO intra
    edges (labels from a different threshold than the edge set) surfaces
    as density 0 instead of vanishing; cross-cluster edges count for
    neither side."""
    from entity_linkings_spark.operators.clustering import cluster_density

    star = [("h", x) for x in ("l1", "l2", "l3", "l4")]
    clique = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    edges = spark.createDataFrame(
        star + clique + [("p", "q"), ("a", "h")], "u string, v string"
    )
    labels = connected_components(edges)
    out = {r["cluster_id"]: (r["size"], r["n_edges"], r["density"])
           for r in cluster_density(labels, edges).collect()}
    # merged star+clique+bridge: 9 nodes, 4+6+1 edges
    assert out["a"] == (9, 11, 11 * 2 / (9 * 8))
    assert out["p"] == (2, 1, 1.0)
    # separate components (no bridge): star vs clique separate cleanly
    edges2 = spark.createDataFrame(star + clique + [("p", "q")],
                                   "u string, v string")
    labels2 = connected_components(edges2)
    out2 = {r["cluster_id"]: (r["size"], r["n_edges"], round(r["density"], 6))
            for r in cluster_density(labels2, edges2).collect()}
    assert out2["h"] == (5, 4, 0.4)
    assert out2["a"] == (4, 6, 1.0)
    # zero-intra-edge cluster: label p,q,r together but give the edge set
    # only (p,q)-external edges -> density 0 row, not a dropped row
    lab3 = spark.createDataFrame(
        [("p", "P"), ("q", "P"), ("r", "P")], "node string, cluster_id string"
    )
    e3 = spark.createDataFrame([("p", "z")], "u string, v string")
    got3 = {r["cluster_id"]: (r["size"], r["n_edges"], r["density"])
            for r in cluster_density(lab3, e3).collect()}
    assert got3["P"] == (3, 0, 0.0)


def test_blocking_quality_metrics_exact(spark):
    """blocking_quality on a hand-computable corpus: 4 records, 2 entities,
    one scheme co-blocks 3 pairs (2 hits), total pairs C(4,2)=6, gold
    pairs 2 -> PC=1.0, PQ=2/3, RR=0.5; a second scheme with one block of
    2 same-entity records -> PC=0.5, PQ=1.0, RR=5/6; a third scheme whose
    blocks are ALL singletons (zero candidate pairs) must still get a row
    — PC=0, PQ=0.0, RR=1.0 — instead of vanishing from the audit
    (ADVICE r7: the worst scheme was the one that disappeared)."""
    from entity_linkings_spark.operators.evaluate import blocking_quality

    records = spark.createDataFrame(
        [("k1", "e1"), ("k2", "e1"), ("k3", "e2"), ("k4", "e2")],
        "skey string, entity_id string",
    )
    keys = spark.createDataFrame(
        # scheme A: block b1={k1,k2,k3}, b2={k3,k4} -> cand {12,13,23,34}
        [("A", "k1", "b1"), ("A", "k2", "b1"), ("A", "k3", "b1"),
         ("A", "k3", "b2"), ("A", "k4", "b2"),
         # scheme B: one block {k1,k2}
         ("B", "k1", "c1"), ("B", "k2", "c1"),
         # scheme C: four singleton blocks -> zero candidate pairs
         ("C", "k1", "d1"), ("C", "k2", "d2"),
         ("C", "k3", "d3"), ("C", "k4", "d4")],
        "scheme string, skey string, bkey string",
    )
    got = {r["scheme"]: r.asDict() for r in blocking_quality(records, keys).collect()}
    assert set(got) == {"A", "B", "C"}
    c = got["C"]
    assert (c["n_cand_pairs"], c["n_hit_pairs"]) == (0, 0)
    assert (c["pair_completeness"], c["pair_quality"], c["reduction_ratio"]) \
        == (0.0, 0.0, 1.0)
    a, b = got["A"], got["B"]
    assert (a["n_records"], a["n_gold_pairs"], a["n_cand_pairs"], a["n_hit_pairs"]) \
        == (4, 2, 4, 2)
    assert (a["pair_completeness"], a["pair_quality"], a["reduction_ratio"]) \
        == (1.0, 0.5, 2 / 6)
    assert (b["n_cand_pairs"], b["n_hit_pairs"]) == (1, 1)
    assert (b["pair_completeness"], b["pair_quality"], b["reduction_ratio"]) \
        == (0.5, 1.0, 5 / 6)


def test_cluster_repair_splits_flagged_only(spark):
    """cluster_repair: the merged star+clique+bridge cluster (density
    11*2/72 < 0.9) is flagged and re-clustered over strong edges (the
    clique only) — the clique survives as one repaired cluster, the hub
    and leaves fall out as singletons; the dense pair cluster (p, q) is
    untouched, id and all."""
    from entity_linkings_spark.operators.clustering import cluster_repair

    star = [("h", x) for x in ("l1", "l2", "l3", "l4")]
    clique = [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    weak = spark.createDataFrame(
        star + clique + [("p", "q"), ("a", "h")], "u string, v string"
    )
    strong = spark.createDataFrame(clique + [("p", "q")], "u string, v string")
    labels = connected_components(weak)
    got = {r["node"]: r["cluster_id"]
           for r in cluster_repair(labels, weak, 0.9, strong).collect()}
    assert got["p"] == got["q"]                       # untouched cluster
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    for n in ("h", "l1", "l2", "l3", "l4"):           # lost all strong edges
        assert got[n] == n
    assert len(got) == 11
    # nothing flagged -> pure pass-through (ids included)
    got2 = {r["node"]: r["cluster_id"]
            for r in cluster_repair(labels, weak, 0.05, strong).collect()}
    assert got2 == {r["node"]: r["cluster_id"] for r in labels.collect()}


def _repair_py(weak, strong, tau):
    """Pure-Python cluster_repair model over distinct canonical edges."""
    from collections import defaultdict

    lab = _uf(weak)
    size, intra = defaultdict(int), defaultdict(int)
    for n, c in lab.items():
        size[c] += 1
    for u, v in weak:
        if lab[u] == lab[v]:
            intra[lab[u]] += 1
    flagged = {c for c in size
               if size[c] >= 2 and 2 * intra[c] / (size[c] * (size[c] - 1)) < tau}
    fln = {n for n, c in lab.items() if c in flagged}
    sedges = [(u, v) for u, v in strong
              if u in fln and v in fln and lab[u] == lab[v]]
    slab = _uf(sedges)
    out = {n: c for n, c in lab.items() if c not in flagged}
    for n in fln:
        out[n] = slab.get(n, n)
    return out


def test_cluster_repair_matches_model_random(spark):
    """Spark cluster_repair == the pure-Python model on seeded random
    graphs: weak = distinct canonical edges, strong = a deterministic
    subset, densities land on both sides of the flag threshold."""
    import random

    from entity_linkings_spark.operators.clustering import cluster_repair

    for seed in range(5):
        rng = random.Random(seed)
        nodes = [f"n{i:02d}" for i in range(30)]
        weak = sorted({
            (min(a, b), max(a, b))
            for a, b in ((rng.choice(nodes), rng.choice(nodes))
                         for _ in range(45))
            if a != b
        })
        strong = [e for i, e in enumerate(weak) if i % 3 != 0]
        wdf = spark.createDataFrame(weak, "u string, v string")
        sdf = spark.createDataFrame(strong, "u string, v string") \
            if strong else spark.createDataFrame([], "u string, v string")
        labels = connected_components(wdf)
        got = {r["node"]: r["cluster_id"]
               for r in cluster_repair(labels, wdf, 0.75, sdf).collect()}
        assert got == _repair_py(weak, strong, 0.75), f"seed={seed}"

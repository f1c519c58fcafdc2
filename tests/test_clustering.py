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

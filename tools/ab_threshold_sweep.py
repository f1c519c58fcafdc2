"""A/B the multi-threshold clustering sweep against k independent runs.

components_at_thresholds' scale claim is that a descending k-threshold sweep
costs ~one full connected-components run plus (k-1) CONTRACTED runs (previous
labels as supernodes + only the newly-admitted weight band), instead of k
full runs over ever-larger edge sets. This measures both sides on the same
corpus (the sorted-neighborhood gram-similarity edges the registered
cc_threshold_sweep query uses), same session, interleaved A/B/A/B so box
drift hits both arms, and prints one JSON line.

Two corpora:
  * default — a deterministic synthetic graph big enough to exercise the
    DISTRIBUTED contraction path (the regime the claim is about): nodes/edges
    via multiplicative hashing of spark.range ids, weights spread uniformly
    so each threshold band admits a real share of edges. The honest corollary
    (first measured run, sf0.1 SN corpus: 486 edges, 176 nodes, every CC call
    takes the driver-side union-find shortcut, sweep 0.5x SLOWER) is that the
    sweep's per-step relabel+checkpoint overhead only pays for itself once
    full runs are distributed-expensive — record both numbers.
  * --corpus — the registered cc_threshold_sweep query's sorted-neighborhood
    gram-similarity edges at $SPARK_GRAFT_SF_DIR (the toy-scale control).

Usage: python tools/ab_threshold_sweep.py [rounds] [--corpus | nodes edges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ARGS = [a for a in sys.argv[1:] if a != "--corpus"]
USE_CORPUS = "--corpus" in sys.argv
ROUNDS = int(ARGS[0]) if ARGS else 2
N_NODES = int(ARGS[1]) if len(ARGS) > 1 else 2_000_000
N_EDGES = int(ARGS[2]) if len(ARGS) > 2 else 6_000_000
THS = [0.5, 0.3, 0.15]


def _synthetic_edges(spark):
    """Deterministic pseudo-random weighted graph: endpoints and weights from
    Knuth multiplicative hashes of the row id — no driver-side RNG, identical
    across runs and parallelism levels."""
    from pyspark.sql import functions as F

    pad = lambda c: F.lpad(c.cast("string"), 9, "0")  # noqa: E731 — stable order
    i = F.col("id")
    return spark.range(N_EDGES).select(
        pad((i * 2654435761) % N_NODES).alias("u"),
        pad((i * 2246822519 + 7) % N_NODES).alias("v"),
        (((i * 3266489917 + 11) % 1000) / 1000.0).alias("sim"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from entity_linkings_spark import get_spark
    from entity_linkings_spark.operators.clustering import (
        clusters_with_singletons,
        components_at_thresholds,
        connected_components,
    )

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    if USE_CORPUS:
        from entity_linkings_spark.driver_queries import _sn_sims

        sims = _sn_sims(spark, SF).localCheckpoint()
    else:
        sims = _synthetic_edges(spark).localCheckpoint()
    n_edges = {t: sims.where(F.col("sim") >= t).count() for t in THS}
    nodes = (
        sims.where(F.col("sim") >= min(THS))
        .select(F.col("u").alias("node"))
        .unionByName(
            sims.where(F.col("sim") >= min(THS)).select(F.col("v").alias("node"))
        )
        .distinct()
        .localCheckpoint()
    )

    def run_sweep() -> float:
        t0 = time.monotonic()
        out = components_at_thresholds(sims, THS, weight_col="sim")
        n = out.count()
        dt = time.monotonic() - t0
        assert n == nodes.count() * len(THS)
        return dt

    def run_independent() -> float:
        t0 = time.monotonic()
        total = 0
        for t in THS:
            comp = connected_components(
                sims.where(F.col("sim") >= t).select("u", "v")
            )
            total += clusters_with_singletons(comp, nodes).count()
        dt = time.monotonic() - t0
        assert total == nodes.count() * len(THS)
        return dt

    sweep, indep = [], []
    for _ in range(ROUNDS):  # interleaved so drift hits both arms
        sweep.append(round(run_sweep(), 3))
        indep.append(round(run_independent(), 3))
    print(json.dumps({
        "mode": "corpus" if USE_CORPUS else
                f"synthetic nodes={N_NODES} edges={N_EDGES}",
        "sf_dir": SF if USE_CORPUS else None,
        "thresholds": THS,
        "edges_per_threshold": n_edges,
        "n_nodes": nodes.count(),
        "sweep_sec": sweep,
        "independent_sec": indep,
        "speedup_best": round(min(indep) / min(sweep), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Two-parallelism scaling datapoint for one_to_one_match (the round-8
assignment operator): generate a large deterministic bipartite scored edge
set IN SPARK (no driver-side materialization), run the matching to its
fixpoint, and report edges/sec at the given core count. Run twice (e.g. 8
and 32 cores) and divide to get the scaling efficiency recorded in
BENCH/BASELINE.md — the same evidence protocol as bench.py's N->4N block.

The corpus is contention-heavy by construction: n_left lefts offer
``degree`` candidate edges each into an n_left/4 right space, so ~4 lefts
fight over every right and the matching needs several locally-dominant-edge
rounds; scores are xxhash64-derived so every round's tie-breaks are real.

Usage: python tools/scale_assignment.py [cores] [n_left] [degree]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from entity_linkings_spark import get_spark
from entity_linkings_spark.operators.assignment import one_to_one_match

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_LEFT = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
DEGREE = int(sys.argv[3]) if len(sys.argv) > 3 else 4

# Measured on this box (80M edges): 128 shuffle partitions at 32 cores ran
# 2x SLOWER than 32 partitions (509s vs 260s) — the 5-round loop multiplies
# per-stage scheduling and checkpoint-partition overheads, and AQE already
# splits any skewed partition at runtime. Keep one fixed partition count
# across core counts so the comparison varies parallelism only;
# SPARK_GRAFT_DRIVER_MEM sizes the single local JVM the same way.
spark = get_spark(master=f"local[{CORES}]", shuffle_partitions=max(CORES, 32))
spark.sparkContext.setLogLevel("ERROR")

# Long ids (the at-scale record-id shape) and (left, right) distinct BY
# CONSTRUCTION: for a fixed left, the four rights differ by j*1000003 mod
# n_right (non-zero for j-deltas 1..3 against a 5M modulus), so the matching
# runs with assume_distinct=True — the measured dominant cost of matching on
# pre-deduped input was the redundant collapse shuffle, and real callers
# (blocking stages, the epoch store's reducer) arrive pre-deduped too.
n_right = max(N_LEFT // 4, 1)
edges = (
    spark.range(N_LEFT)
    .select(
        F.col("id").alias("li"),
        F.explode(F.array(*[F.lit(j) for j in range(1, DEGREE + 1)])).alias("j"),
    )
    .select(
        F.col("li").alias("left_id"),
        ((F.col("li") * 7919 + F.col("j") * 1000003) % n_right).alias("right_id"),
        (
            (F.xxhash64(F.col("li"), F.col("j")) % 100000 + 100000) % 100000
        ).cast("double").alias("score"),
    )
)
n_edges = N_LEFT * DEGREE

t0 = time.time()
matched = one_to_one_match(edges, max_rounds=12, assume_distinct=True)
n_matched = matched.count()
rounds = matched.agg(F.max("round")).first()[0]
dt = time.time() - t0
print({
    "cores": CORES, "edges": n_edges, "matched": n_matched,
    "rounds": rounds, "wall_sec": round(dt, 1),
    "edges_per_sec": round(n_edges / dt),
})
spark.stop()

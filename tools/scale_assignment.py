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

# 4 partitions per core keeps each task's groupBy/min_by slice small enough
# to aggregate in memory at any core count (the memory pool is shared across
# concurrent tasks, so per-task slices must shrink as parallelism grows);
# SPARK_GRAFT_DRIVER_MEM sizes the single local JVM — use the same value at
# both core counts so the comparison varies parallelism only.
spark = get_spark(master=f"local[{CORES}]", shuffle_partitions=4 * max(CORES, 8))
spark.sparkContext.setLogLevel("ERROR")

n_right = max(N_LEFT // 4, 1)
edges = (
    spark.range(N_LEFT)
    .select(
        F.col("id").alias("li"),
        F.explode(F.array(*[F.lit(j) for j in range(1, DEGREE + 1)])).alias("j"),
    )
    .select(
        F.concat(F.lit("l"), F.col("li").cast("string")).alias("left_id"),
        F.concat(
            F.lit("r"), ((F.col("li") * F.col("j") * 7919) % n_right).cast("string")
        ).alias("right_id"),
        (
            (F.xxhash64(F.col("li"), F.col("j")) % 100000 + 100000) % 100000
        ).cast("double").alias("score"),
    )
)
n_edges = N_LEFT * DEGREE

t0 = time.time()
matched = one_to_one_match(edges, max_rounds=12)
n_matched = matched.count()
rounds = matched.agg(F.max("round")).first()[0]
dt = time.time() - t0
print({
    "cores": CORES, "edges": n_edges, "matched": n_matched,
    "rounds": rounds, "wall_sec": round(dt, 1),
    "edges_per_sec": round(n_edges / dt),
})
spark.stop()

"""Two-parallelism datapoint for the composed linker (plans/linker.py):
two deterministic clean files (right = typo'd left surfaces plus orphans),
full link_datasets run — per-side blocking keys, bipartite candidate join,
Arrow pair scoring, one-to-one matching, both unmatched audits — and the
records/sec throughput at the given core count. Run at two core counts and
divide for the scaling-efficiency row in BENCH/BASELINE.md (same protocol
as scale_assignment.py).

Usage: python tools/scale_linker.py [cores] [n_records]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from entity_linkings_spark import get_spark
from entity_linkings_spark.plans.linker import LinkerConfig, link_datasets

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

spark = get_spark(master=f"local[{CORES}]", shuffle_partitions=max(CORES, 32))
spark.sparkContext.setLogLevel("ERROR")

# Deterministic two-token surfaces over a bounded vocab: id -> "wA wB".
# Vocab ~1000 x 1000 tokens keeps token blocks hot enough to exercise the
# bipartite cap while LSH recovers the dropped pairs.
VOCAB = 997  # prime: id*k mod VOCAB walks the full vocab


def surfaces(ids):
    # (id % VOCAB, id // VOCAB) is injective below VOCAB^2 (~994k), so each
    # record's surface is UNIQUE — both files are genuinely clean. The omega
    # token takes only N/VOCAB distinct values, so its blocks are hot enough
    # to trip the bipartite cap; the typo breaks the alpha token, so planted
    # twins are recovered through the LSH bands, not token equality.
    w1 = F.concat(F.lit("alpha"), (F.col("id") % VOCAB).cast("string"))
    w2 = F.concat(F.lit("omega"), (F.col("id") / VOCAB).cast("int").cast("string"))
    return ids.select(
        F.col("id"),
        F.concat_ws(" ", w1, w2).alias("surface"),
    )


left = surfaces(spark.range(N)).select(
    F.concat(F.lit("L"), F.col("id").cast("string")).alias("record_id"),
    "surface",
)
# right: 80% typo'd twins (swap chars 2/3 of the first token), 20% orphans
# with an out-of-vocab surface
base = surfaces(spark.range(N))
typo = F.concat(
    F.substring("surface", 1, 1),
    F.substring("surface", 3, 1),
    F.substring("surface", 2, 1),
    F.expr("substring(surface, 4)"),
)
right = base.select(
    F.concat(F.lit("R"), F.col("id").cast("string")).alias("record_id"),
    F.when(F.col("id") % 5 < 4, typo)
    .otherwise(F.concat(F.lit("zq orphan "), F.col("id").cast("string")))
    .alias("surface"),
)

t0 = time.time()
out = link_datasets(left, right, config=LinkerConfig(max_block_pairs=50_000))
n_match = out["matches"].count()
n_ul = out["unmatched_left"].count()
n_ur = out["unmatched_right"].count()
dt = time.time() - t0
print({
    "cores": CORES, "records_per_side": N, "matches": n_match,
    "unmatched_left": n_ul, "unmatched_right": n_ur,
    "wall_sec": round(dt, 1),
    "records_per_sec": round(2 * N / dt),
})
spark.stop()

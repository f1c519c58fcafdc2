"""10x-input throughput experiment: replicate the bench corpus (800k turns)
K times IN SPARK (deterministic conv_id suffixes) and run the full pipeline.
Distinct surfaces stay constant by design (pair space independent of
instance count) — this measures the instance-proportional stages
(extraction, instance joins) at 8M turns on one box.

Usage: python tools/scale_throughput.py [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from entity_linkings_spark import get_spark
from entity_linkings_spark.datagen import ensure_dataset
from entity_linkings_spark.plans.pipeline import LinkagePipeline

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
paths = ensure_dataset("bench")
tr = spark.read.parquet(paths["transcripts"])
dic = spark.read.parquet(paths["entity_dictionary"])
reps = F.explode(F.array(*[F.lit(i) for i in range(K)])).alias("rep")
big = tr.select(reps, *tr.columns).withColumn(
    "conv_id", F.concat_ws("#", "conv_id", F.col("rep").cast("string"))
).drop("rep")
n_turns = big.count()
t0 = time.time()
out = LinkagePipeline(dic).run(big)
n = out["resolved_mentions"].count()
dt = time.time() - t0
print({"turns": n_turns, "mentions": n, "wall_sec": round(dt, 1),
       "turns_per_sec": round(n_turns / dt), "mentions_per_sec": round(n / dt)})
spark.stop()

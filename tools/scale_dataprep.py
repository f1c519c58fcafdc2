"""10x-input throughput datapoint for the dataprep flagship (VERDICT r7
#6): replicate the sf0.1 documents table K times IN SPARK (doc_id offset
per replica keeps ids unique and intra-replica adjacency — the plants'
doc_id arithmetic stays valid inside each replica), land it as a temp sf
dir, and run the full composed dataprep_pipeline on it.

Unlike the linkage 10x (distinct surfaces constant by design), here the
DOCUMENT space itself grows 10x — every stage's input scales: the URL
keeper agg, the blocklist join, the boilerplate pass, the band join, the
gram spine, the packer. That makes this the scaling datapoint for the
dedup cascade rather than the instance joins.

Usage: python tools/scale_dataprep.py [K]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from entity_linkings_spark import get_spark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
TMP = os.path.join(REPO, ".data", f"scale_dataprep_{K}x")

spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

shutil.rmtree(TMP, ignore_errors=True)
os.makedirs(TMP)
# the dataprep flagship reads only `documents`; link the other tables so
# the dir is a drop-in sf dir all the same
for f in os.listdir(SRC):
    if f.endswith(".parquet") and f != "documents.parquet":
        os.symlink(os.path.join(SRC, f), os.path.join(TMP, f))
docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
reps = F.explode(F.array(*[F.lit(i) for i in range(K)])).alias("rep")
big = (
    docs.select(reps, *docs.columns)
    .withColumn("doc_id", F.col("doc_id") + F.col("rep").cast("long") * 1_000_000_000)
    .drop("rep")
)
big.write.parquet(os.path.join(TMP, "documents.parquet"))
n_docs = spark.read.parquet(os.path.join(TMP, "documents.parquet")).count()

from entity_linkings_spark.driver_queries import QUERIES  # noqa: E402

t0 = time.time()
rows = QUERIES["dataprep_pipeline"](spark, TMP).count()
dt = time.time() - t0
print({"docs": n_docs, "packed_rows": rows, "wall_sec": round(dt, 1),
       "docs_per_sec": round(n_docs / dt)})
spark.stop()
shutil.rmtree(TMP, ignore_errors=True)

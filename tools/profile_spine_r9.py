"""Round-9 stage-isolation profiler (guide §1.4): times each stage of the
MinHash near-dup spine and the sorted-neighborhood sims spine with noop-style
actions, so optimization targets are measured, not guessed.

Usage: python tools/profile_spine_r9.py [minhash|snsims|tfidf] (default all)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from entity_linkings_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = round(time.time() - t0, 3)
    print(json.dumps({"stage": label, "sec": dt}), flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="profile-spine-r9", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from entity_linkings_spark.operators import dedup as D
    import entity_linkings_spark.driver_queries as Q

    # warmup (same as bench)
    spark.range(0, 5_000_000, 1, 64).agg(F.sum("id")).collect()
    spark.read.parquet(os.path.join(SF, "region.parquet")).count()

    if which in ("minhash", "all"):
        docs = Q._docs(spark, SF)
        timed(spark, "docs: count", lambda: docs.count())
        sig_only = docs.repartition(32).select(
            "doc_id",
            __import__(
                "entity_linkings_spark.functions.hashing", fromlist=["x"]
            ).minhash_signature(D.word_shingles("text", 5), 24).alias("sig"),
        )
        timed(spark, "minhash: signature only (noop)", lambda: noop(sig_only))
        bands = D.minhash_bands(docs, "doc_id", D.word_shingles("text", 5))
        timed(spark, "minhash: bands (noop)", lambda: noop(bands))
        bands_cp = timed(
            spark, "minhash: bands localCheckpoint",
            lambda: D.minhash_bands(docs, "doc_id", D.word_shingles("text", 5)).localCheckpoint(),
        )
        cand = D.band_pairs(bands_cp, "doc_id").select("id_a", "id_b")
        timed(spark, "minhash: band_pairs from checkpointed bands (noop)", lambda: noop(cand))
        jac = D.shingle_jaccard(docs, cand, "doc_id", "text", 5)
        timed(spark, "minhash: shingle_jaccard (noop)", lambda: noop(jac))
        edges = jac.where(F.col("jaccard") >= 0.5)
        timed(spark, "minhash: edges count", lambda: print("edges:", edges.count()))
        from entity_linkings_spark.operators.clustering import connected_components
        pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")  # noqa: E731
        e2 = jac.where(F.col("jaccard") >= 0.5).select(
            pad("id_a").alias("u"), pad("id_b").alias("v"))
        timed(spark, "minhash: full cc_components (count)",
              lambda: print("labels:", connected_components(e2).count()))

    if which in ("snsims", "all"):
        sims = Q._sn_sims(spark, SF)
        timed(spark, "snsims: full (noop)", lambda: noop(sims))
        recs = Q._bq_records(spark, SF)
        timed(spark, "snsims: records (noop)", lambda: noop(recs))
        from entity_linkings_spark.operators.blocking import sorted_neighborhood_pairs
        prs = sorted_neighborhood_pairs(recs, "surface", "skey", window=5)
        timed(spark, "snsims: sn_pairs (noop)", lambda: noop(prs))

    if which in ("tfidf", "all"):
        ents = Q._part(spark, SF).select(
            F.col("p_partkey").alias("entity_id"), F.col("p_name").alias("text"))
        qs = (
            Q._variants(spark, SF)
            .where(F.col("p_partkey") % 5 == 0)
            .select(F.col("p_partkey").alias("query_id"),
                    F.col("surface").alias("text")))
        from entity_linkings_spark.operators.retrieval import (
            entity_postings, tfidf_topk)
        timed(spark, "tfidf: n_queries", lambda: print("q:", qs.count()))
        post = entity_postings(ents)
        timed(spark, "tfidf: postings (noop)", lambda: noop(post))
        # the scored+window 'cand' subtree alone (fill=False path)
        nf = tfidf_topk(ents, qs, k=5, fill=False)
        timed(spark, "tfidf: topk fill=False (noop)", lambda: noop(nf))
        full = tfidf_topk(ents, qs, k=5)
        timed(spark, "tfidf: topk fill=True (noop)", lambda: noop(full))

    spark.stop()


if __name__ == "__main__":
    main()

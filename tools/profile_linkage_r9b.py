"""Phase-level profile of pipeline_linkage (round-9 continuation).

Times each stage materialization separately (noop sink / probe) and counts
Spark jobs per phase via job groups, so we can see where the ~18s hermetic
row actually goes on this box.

Usage: python tools/profile_linkage_r9b.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from entity_linkings_spark import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="profile-linkage", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

# generic warmup (same as bench)
spark.range(0, 5_000_000, 1, 64).agg(F.sum("id")).collect()
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

tracker = sc._jsc.sc().statusTracker()


def jobs_in(group):
    return len(tracker.getJobIdsForGroup(group))


def phase(name, fn):
    sc.setJobGroup(name, name)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{name:36s} {dt:7.2f}s  jobs={jobs_in(name)}")
    sc.setJobGroup("idle", "idle")
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for rep in range(2):
    print(f"--- rep {rep} ---")
    t_all = time.time()
    from entity_linkings_spark.plans.pipeline import LinkagePipeline

    dic = phase("construct:dic", lambda: entrymod._part_dictionary(spark, sf_dir))
    tr = phase("construct:transcripts", lambda: entrymod._derived_transcripts(spark, sf_dir))
    pipe = phase("construct:pipe(dict token sets)", lambda: LinkagePipeline(dic))

    mentions = pipe.mentions(tr).cache()
    phase("mat:mentions", lambda: noop(mentions))
    surfaces = pipe.surfaces(mentions).cache()
    phase("mat:surfaces", lambda: noop(surfaces))
    keys = pipe.surface_keys(surfaces).cache()
    phase("mat:keys", lambda: noop(keys))
    pairs = pipe.pairs(surfaces, keys)
    scored = pipe.scored_pairs(pairs, surfaces).cache()
    phase("mat:scored(arrow)", lambda: noop(scored))
    resolved = pipe.resolve(surfaces, keys).cache()
    phase("mat:resolved", lambda: noop(resolved))
    clusters = phase("clusters(CC probe)", lambda: pipe.clusters(scored, surfaces, resolved))
    mc = pipe.mention_clusters(mentions, clusters)
    final = (
        mc.join(resolved.select("skey", "entity_id", "score"), "skey", "left")
        .select(
            "conv_id", "turn_idx", "start", "end", "mention",
            "mention_id", "cluster_id", "entity_id", "score",
        )
        .orderBy("conv_id", "turn_idx", "start")
        .withColumn("score", F.round("score", 6))
    )
    phase("final count", lambda: final.count())
    print(f"TOTAL {time.time() - t_all:7.2f}s")
    spark.catalog.clearCache()

spark.stop()

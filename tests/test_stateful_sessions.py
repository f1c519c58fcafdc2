"""applyInPandasWithState gap sessionization: cross-batch state carry,
gap-based closes, bounded per-user state."""

import time

import pyspark.sql.functions as F


def test_stateful_sessionize_stream(spark, tmp_path):
    from entity_linkings_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "events")
    t0 = 1735725600000  # 2025-01-01 10:00 UTC, ms
    MIN = 60_000

    def write(rows, name):
        df = spark.createDataFrame(rows, "user_id string, tms long").select(
            "user_id", F.timestamp_millis("tms").alias("ts")
        )
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod times -> file-source batch order

    write([("A", t0), ("A", t0 + 10 * MIN), ("B", t0 + 5 * MIN)], "f1")
    write([("A", t0 + 20 * MIN), ("A", t0 + 180 * MIN), ("C", t0 + 600 * MIN)], "f2")

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_ms=30 * MIN, watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }
    # A's first session spans both files (state carried across batches) and
    # closes because the 13:00 event exceeds the 30-min gap
    assert ("A", t0, t0 + 20 * MIN, 3) in rows
    # no partial/duplicate emissions of that session
    assert sum(1 for r in rows if r[0] == "A" and r[1] == t0) == 1

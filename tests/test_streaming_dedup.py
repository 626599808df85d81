"""dropDuplicatesWithinWatermark dedup (streaming/dedup.py): duplicate
deliveries inside the late horizon are dropped; output matches the
batch dropDuplicates on the same data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nemscraper_spark.streaming.dedup import dedup_stream

ROWS = [
    # (event_id, epoch, value) — event 1 delivered three times, 2 twice
    (1, 1000, 1.0),
    (1, 1005, 1.0),
    (2, 1100, 2.0),
    (1, 1300, 1.0),
    (2, 1150, 2.0),
    (3, 1200, 3.0),
]


def test_stream_dedup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    batch = (
        spark.createDataFrame(ROWS, "event_id long, epoch long, value double")
        .select("event_id", F.timestamp_seconds("epoch").alias("ts"), "value")
    )
    batch.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("event_id long, ts timestamp, value double").parquet(
        src
    )
    q = (
        dedup_stream(stream, ["event_id"], "ts", "1 hour")
        .writeStream.foreachBatch(
            lambda df, _e: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {r.event_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}
    assert spark.read.parquet(out).count() == 3  # one row per key
    # batch twin agrees
    assert batch.dropDuplicates(["event_id"]).count() == 3

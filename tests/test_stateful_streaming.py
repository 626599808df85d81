"""applyInPandasWithState sessionization (streaming/stateful.py):
closed sessions must match the batch sessionizer's semantics, and state
must survive a query restart (checkpoint recovery)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nemscraper_spark.streaming.stateful import sessionize_stream

ROWS_B1 = [
    # user 1: two sessions closed inside the batch, one left open
    (1, 0, 1.0),
    (1, 300, 2.0),
    (1, 6000, 4.0),
    (1, 6180, 8.0),
    (1, 20000, 16.0),
    # user 2: one session, left open
    (2, 100, 1.5),
]
ROWS_B2 = [
    # user 1: gap > 30min after 20000 -> closes the (20000,) session
    (1, 30000, 32.0),
    # user 2: extends the open session (gap 500s), nothing closes
    (2, 600, 2.5),
]


def _write_batch(spark, path, rows):
    (
        spark.createDataFrame(rows, "user_id long, epoch long, value double")
        .select(
            "user_id",
            F.timestamp_seconds(F.col("epoch")).alias("ts"),
            "value",
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(path)
    )


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(
        src
    )
    sessions = sessionize_stream(stream, gap_seconds=1800, idle_flush_ms=None)

    def sink(batch_df, _epoch):
        batch_df.write.mode("append").parquet(out)

    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _sessions(spark, out):
    if not os.path.exists(out):
        return set()
    return {
        (r.user_id, r.session_start.timestamp(), r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }


def test_stateful_sessionize_across_batches(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions")
    os.makedirs(src)

    _write_batch(spark, src, ROWS_B1)
    _drain(spark, src, ckpt, out)
    # sessions [0,300] and [6000,6180] closed by in-batch gaps; the
    # (20000,) and user-2 sessions stay open in state
    assert _sessions(spark, out) == {(1, 0.0, 2, 3.0), (1, 6000.0, 2, 12.0)}

    _write_batch(spark, src, ROWS_B2)
    _drain(spark, src, ckpt, out)
    # state carried across the restart: the 20000 session is closed by
    # the 30000 event; user 2's extension closes nothing
    assert _sessions(spark, out) == {
        (1, 0.0, 2, 3.0),
        (1, 6000.0, 2, 12.0),
        (1, 20000.0, 1, 16.0),
    }

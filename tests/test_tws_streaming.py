"""transformWithState running totals (streaming/tws.py): updated
aggregates must accumulate across micro-batches through the state store
(checkpoint recovery between drains), and the final totals must equal
the batch groupBy twin.

The TWS python protocol speaks protobuf to the JVM state server; this
container ships no usable google.protobuf, so the whole module skips
there (the operator itself is gated the same way — import-try per the
environment contract)."""

from __future__ import annotations

import os

import pytest

try:
    from google.protobuf import descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

pytestmark = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs google.protobuf (absent in this env)",
)

from pyspark.sql import functions as F

from nemscraper_spark.streaming.tws import running_totals_stream

ROWS_B1 = [
    (1, 0, 1.0),
    (1, 300, 2.0),
    (2, 100, 1.5),
]
ROWS_B2 = [
    (1, 600, 4.0),
    (3, 700, 8.0),
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


_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    totals = running_totals_stream(stream)

    def sink(batch_df, epoch):
        batch_df.withColumn("epoch", F.lit(epoch)).write.mode("append").parquet(out)

    # transformWithState requires the RocksDB state store; scope the
    # provider override to this query so other tests' checkpoints keep
    # the default provider they were created with
    prev = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        q = (
            totals.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)


def _latest(spark, out):
    """Last emitted total per user (updates supersede older emissions)."""
    if not os.path.exists(out):
        return {}
    rows = spark.read.parquet(out).collect()
    best = {}
    for r in rows:
        cur = best.get(r.user_id)
        if cur is None or r.epoch >= cur[0]:
            best[r.user_id] = (r.epoch, r.n_events, r.sum_value, r.max_value)
    return {u: v[1:] for u, v in best.items()}


def test_tws_running_totals_accumulate(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "totals")
    os.makedirs(src)

    _write_batch(spark, src, ROWS_B1)
    _drain(spark, src, ckpt, out)
    assert _latest(spark, out) == {1: (2, 3.0, 2.0), 2: (1, 1.5, 1.5)}

    _write_batch(spark, src, ROWS_B2)
    _drain(spark, src, ckpt, out)
    # state survived the restart: user 1 extends, user 3 is new, user 2
    # (no rows in batch 2) keeps its old total
    assert _latest(spark, out) == {
        1: (3, 7.0, 4.0),
        2: (1, 1.5, 1.5),
        3: (1, 8.0, 8.0),
    }

    # batch twin: the final streaming totals equal a plain groupBy
    batch = {
        (r.user_id): (r.n, r.s, r.m)
        for r in (
            spark.read.parquet(src)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("s"),
                F.max("value").alias("m"),
            )
            .collect()
        )
    }
    assert _latest(spark, out) == batch

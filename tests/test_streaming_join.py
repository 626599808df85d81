"""Stream-stream interval join (streaming/join.py): clicks attribute to
views within the horizon; streaming output matches the batch twin on
the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.streaming.join import attribute_to_impression

VIEWS = [
    # (user_id, epoch)
    (1, 1000),
    (1, 2000),
    (2, 1000),
    (3, 5000),
]
CLICKS = [
    # (user_id, epoch, click_id)
    (1, 1100, 10),  # attributes to view@1000 only (2000 is later)
    (1, 2300, 11),  # attributes to view@2000; view@1000 is > 10min before
    (2, 1900, 12),  # within 600s horizon -> attributes to view@1000 (edge: 900s > 600s? no: 1900-1000=900 > 600 -> NO match)
    (3, 4000, 13),  # click before the view -> no match
]


def _sets(df):
    return {
        (r.user_id, r.click_id, r.view_epoch, r.click_epoch) for r in df.collect()
    }


def test_stream_join_matches_batch(spark, tmp_path):
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    vb = spark.createDataFrame(VIEWS, "user_id long, epoch long").select(
        "user_id",
        F.timestamp_seconds("epoch").alias("view_ts"),
        F.col("epoch").alias("view_epoch"),
    )
    cb = spark.createDataFrame(CLICKS, "user_id long, epoch long, click_id long").select(
        "user_id",
        F.timestamp_seconds("epoch").alias("click_ts"),
        F.col("epoch").alias("click_epoch"),
        "click_id",
    )
    vb.coalesce(1).write.parquet(vsrc)
    cb.coalesce(1).write.parquet(csrc)

    batch = attribute_to_impression(vb, cb, horizon="10 minutes")
    expected = _sets(batch)
    # sanity-pin the semantics themselves, not just stream/batch parity
    assert expected == {(1, 10, 1000, 1100), (1, 11, 2000, 2300)}

    vs = spark.readStream.schema(
        "user_id long, view_ts timestamp, view_epoch long"
    ).parquet(vsrc)
    cs = spark.readStream.schema(
        "user_id long, click_ts timestamp, click_epoch long, click_id long"
    ).parquet(csrc)
    q = (
        attribute_to_impression(vs, cs, horizon="10 minutes")
        .writeStream.foreachBatch(lambda df, _e: df.write.mode("append").parquet(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert _sets(spark.read.parquet(out)) == expected

"""The segmented-scan EWMA must equal the sequential recurrence —
that's the whole point of the stitch (operators/ewma.py:ewma_chunked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.operators.ewma import ewma, ewma_chunked
from nemscraper_spark.queries.common import load_table

ALPHA = 2.0 / 9.0


def test_chunked_matches_sequential(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("day", F.to_date("ts"))
    )
    plain = ewma(
        ev.drop("day"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=ALPHA,
        negate=True,
        out_col="fm",
    )
    chunked = ewma_chunked(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=ALPHA,
        chunk_col="day",
        negate=True,
        out_col="fm",
    )
    want = {r.event_id: r.fm for r in plain.collect()}
    got = {r.event_id: r.fm for r in chunked.collect()}
    assert len(got) == len(want)
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst < 1e-9, worst


def test_chunked_more_tasks_than_keys(spark, sf_dir):
    """The stitch's reason to exist: parallelism = |keys × chunks|, not
    |keys|. With 1 key and ~30 day-chunks the local pass must fan out."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("user_id", F.lit(0))  # collapse to ONE key
        .withColumn("day", F.to_date("ts"))
    )
    chunks = ev.select("day").distinct().count()
    assert chunks > 10
    out = ewma_chunked(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=ALPHA,
        chunk_col="day",
        out_col="fm",
    )
    assert out.count() == ev.count()

"""Behavior tests for the driver-checkable streaming queries
(queries/streaming_ops.py) beyond the registry-wide oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries import REGISTRY


def test_streaming_window_counts_reinvocation(spark, sf_dir):
    """The memory-sink queryName is reused across invocations in one
    session (the driver may retry): the second run must succeed and
    return the same totals, not collide with the first registration."""
    fn = REGISTRY["streaming_window_counts"].fn
    a = fn(spark, sf_dir).agg(
        F.sum("n_events").alias("n"), F.count("*").alias("g")
    ).collect()[0]
    b = fn(spark, sf_dir).agg(
        F.sum("n_events").alias("n"), F.count("*").alias("g")
    ).collect()[0]
    assert (a["n"], a["g"]) == (b["n"], b["g"])
    assert a["n"] > 0


def test_streaming_dedup_replay_exactly_once(spark, sf_dir):
    """Redelivered (unioned) stream must collapse to exactly the batch
    event set: no duplicate event_ids survive, none are lost."""
    from nemscraper_spark.queries.common import load_table

    out = REGISTRY["streaming_dedup_replay"].fn(spark, sf_dir)
    n_out = out.count()
    n_dist = out.select("event_id").distinct().count()
    n_src = load_table(spark, sf_dir, "events").count()
    assert n_out == n_dist == n_src

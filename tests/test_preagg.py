"""Rollup-from-preagg must EXACTLY equal aggregating the raw table at
the coarser granularity (partial states are mergeable; DECIMAL sums
make equality bit-exact, not approximate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.plans.preagg import build_preagg, finalize, rollup_preagg
from nemscraper_spark.queries.common import load_table


def _rows(df):
    out = {}
    for r in df.collect():
        key = (r.bucket_start, r.event_type)
        out[key] = (r.n, r.sum_value, r.avg_value, r.min_value, r.max_value)
    return out


def test_hour_rollup_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")

    pre5 = build_preagg(ev, "ts", "5 minutes", ["event_type"], "value")
    from_pre = _rows(rollup_preagg(pre5, "1 hour", ["event_type"]))
    direct = _rows(
        finalize(build_preagg(ev, "ts", "1 hour", ["event_type"], "value"))
    )
    assert from_pre == direct
    assert len(direct) > 0


def test_preagg_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The materialized form (write -> read -> merge) stays exact —
    the continuous-aggregate maintenance loop."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "preagg5m")
    build_preagg(ev, "ts", "5 minutes", ["event_type"], "value").write.parquet(path)
    from_disk = _rows(rollup_preagg(spark.read.parquet(path), "1 hour", ["event_type"]))
    direct = _rows(finalize(build_preagg(ev, "ts", "1 hour", ["event_type"], "value")))
    assert from_disk == direct

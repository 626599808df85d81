"""Pin the approximate sketches against exact values with the sketches'
own error bounds (they have no DuckDB oracle — engine-specific
internals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries import REGISTRY
from nemscraper_spark.queries.common import load_table


def test_approx_sketches_within_bounds(spark, sf_dir):
    got = {r.event_type: r for r in REGISTRY["approx_sketches"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        assert abs(g.approx_users - e.users) <= max(2, 0.1 * e.users)
        # exact-percentile vs sketch: generous tolerance, catches gross breakage
        assert abs(g.q50 - e.p50) <= 0.2 * max(1.0, abs(e.p50))
        assert g.q50 <= g.q95 <= g.q99
        assert g.n == e.n

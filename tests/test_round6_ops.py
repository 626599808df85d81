"""Round-6 edge-case pins for the ADVICE fixes: IVM zero-multiplicity
cleanup, single-day trend-slope division guard, scoped recursion-limit
raise, and the scale-safe equi-depth histogram swap."""

from __future__ import annotations

import pandas as pd
import pytest

from nemscraper_spark.queries import REGISTRY


def test_ivm_retraction_drops_all_deleted_group(spark, tmp_path):
    """A group whose orders are ALL deleted must VANISH from the
    maintained view (the from-scratch recompute never emits it) — not
    linger as an n=0/revenue=0 tombstone from the signed sum.  TPC-H
    data never triggers this (5 priorities, ~1% delete rate), so pin
    it with a corpus where one priority's only orderkeys are multiples
    of 97 (the query's delete predicate)."""
    orders = pd.DataFrame(
        {
            "o_orderkey": [97, 194, 1, 2, 3],
            "o_orderpriority": ["GONE", "GONE", "KEPT", "KEPT", "KEPT"],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [97, 194, 1, 2, 3, 3],
            "l_extendedprice": [10.0, 20.0, 1.5, 2.5, 3.0, 4.0],
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet")
    lineitem.to_parquet(tmp_path / "lineitem.parquet")

    rows = {
        r.o_orderpriority: r
        for r in REGISTRY["ivm_retraction_view"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert "GONE" not in rows  # all contributions cancelled -> no row
    assert rows["KEPT"].n == 4
    assert rows["KEPT"].revenue == pytest.approx(11.0)


def test_volume_trend_slope_single_day_is_null(spark, tmp_path):
    """An event_type active on exactly ONE day has a degenerate
    regression (den = 0): the slope must be NULL — and must be NULL in
    BOTH engines.  Unguarded, non-ANSI Spark division yields NULL
    while IEEE-mode DuckDB yields NaN/inf, so the hash gate would
    split on exactly this data."""
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00",  # solo: one active day
            "2024-01-01 11:00",
            "2024-02-01 10:00",  # multi: three active days
            "2024-02-02 10:00",
            "2024-02-03 10:00",
            "2024-02-03 11:00",
        ]
    )
    events = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": ts,
            "event_type": ["solo", "solo", "m", "m", "m", "m"],
            "user_id": [1, 2, 3, 4, 5, 6],
            "value": [1.0] * 6,
        }
    )
    events.to_parquet(tmp_path / "events.parquet")

    rows = {
        r.event_type: r
        for r in REGISTRY["volume_trend_slope"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["solo"].n_days == 1
    assert rows["solo"].slope_per_day is None
    assert rows["m"].slope_per_day is not None
    # days (0,1,2) with counts (1,1,2): lsq slope = 0.5
    assert rows["m"].slope_per_day == pytest.approx(0.5)


def test_recursive_cte_restores_recursion_limit(spark, sf_dir):
    """The recursion-row-limit safety valve must be back at its prior
    value once the query returns (it used to stay raised session-wide,
    weakening runaway protection for later recursive queries), while
    the returned frame stays collectable (lineage truncated)."""
    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    df = REGISTRY["recursive_cte_hierarchy"].fn(spark, sf_dir)
    assert spark.conf.get(key) == before
    # collect AFTER the conf is restored — the checkpoint must carry it
    n = df.count()
    assert n > 0


def test_equidepth_primary_is_sketch_based(spark, sf_dir):
    """The production equi-depth histogram must plan its boundaries as
    a mergeable approx_percentile sketch — never the exact global
    percentile whose final reducer materializes the value multiset
    (the round-5 perf_weak).  The exact form survives only as the
    _exact hash twin."""
    df = REGISTRY["equidepth_histogram_price"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan or "percentile_approx" in plan
    lowered = plan.lower()
    # no exact percentile aggregate anywhere in the physical plan
    assert "percentile(" not in lowered.replace("approx_percentile(", "")
    rows = df.collect()
    assert sorted(r.bucket for r in rows) == [1, 2, 3, 4]
    assert all(r.depth_within_band for r in rows)
    assert all(r.bounds_ordered for r in rows)
    n_total = {r.n_total for r in rows}
    assert len(n_total) == 1 and n_total.pop() > 0

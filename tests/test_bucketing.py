"""Bucketed co-located join: same-bucketed fact tables must join with
zero shuffle (no Exchange in the plan) — the write-once-join-many
strategy for 100TB fact-to-fact joins."""

from __future__ import annotations

from nemscraper_spark.plans.bucketize import bucketed_join, write_bucketed
from nemscraper_spark.queries.common import load_table
from tests.test_plan_quality import plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # external-table paths keep test data out of the repo's warehouse
    write_bucketed(
        li, "b_lineitem", "l_orderkey", n_buckets=8,
        path=str(tmp_path / "b_lineitem"),
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        n_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        p = plan(joined)
        assert "Exchange" not in p, p
        assert joined.count() == li.count()  # every lineitem has an order

        # control: the same join over the raw (unbucketed) parquet DOES
        # shuffle — proving the bucket layout is what removed it
        raw = li.join(o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        assert "Exchange" in plan(raw)

        # same-key aggregation rides the bucket layout too: no Exchange
        agg = spark.table("b_lineitem").groupBy("l_orderkey").count()
        assert "Exchange" not in plan(agg)

        # one file per bucket (the pre-shuffle write): multi-file
        # buckets would both explode the file count at scale and void
        # the sortBy guarantee
        import os

        files = [
            f
            for f in os.listdir(tmp_path / "b_lineitem")
            if f.endswith(".parquet")
        ]
        assert len(files) == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")

"""Bucketed table layout for shuffle-free co-located joins.

At 100TB the dominant cost of fact-to-fact joins is the shuffle. The
reference never joins two large tables (its dims are small), but a user
scaling it up would: bucketing both sides by the join key at write time
makes every later join/agg on that key a zero-shuffle sort-merge —
the write-once-join-many trade.

Catalog note: bucketed layout requires saveAsTable (bucket metadata
lives in the session catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``bucket_col``.

    Pre-shuffles onto the bucket hash first (the same Murmur3
    HashPartitioning the bucket spec uses), so each write task owns
    exactly one bucket and emits ONE file per bucket. Without it every
    task writes a sliver of every bucket — num_tasks x n_buckets small
    files — and multi-file buckets void the sortBy guarantee (Spark
    >= 3.0 ignores bucket sort order at scan unless
    ``spark.sql.legacy.bucketedTableScanOutputOrdering`` is set,
    precisely because multi-file buckets can't promise it).

    ``path`` makes the table external (data at ``path``, bucket
    metadata in the catalog — the metadata is what lets Catalyst elide
    the Exchange later)."""
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    writer = writer.sortBy(sort_col or bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with
    NO Exchange on either side (verified in tests/test_bucketing.py).

    The merge hint models the 100TB case: neither fact side fits a
    broadcast, and without it the planner would broadcast the small
    side at test scale and skip the bucketed scan entirely.
    """
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), on)
    )

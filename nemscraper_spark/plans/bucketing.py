"""Bucketed table layout — shuffle-free co-located joins at 100 TB.

The reference joins everything in-process (Polars/DuckDB single node,
src/bin/crunch.rs), so it never needs a layout answer to the question
"how do two 50 TB fact tables join without moving either?". On a
cluster the standard answer is BUCKETING: write both tables
pre-hash-partitioned (and optionally sorted) on the join key; a
later equi-join on that key reads bucket i of each side into the same
task — zero Exchange, zero sort (if sorted), repeatable across every
downstream job that joins on the key. The shuffle is paid ONCE at
write time, amortized over every subsequent join/aggregation.

Spark-native: ``bucketBy(n, key).sortBy(key).saveAsTable`` records the
layout in the catalog; Catalyst then plans SortMergeJoin with both
Exchanges elided — the network win, pinned in
tests/test_plan_quality.py. (A task-local Sort remains: Spark >= 3.0
ignores bucket sort order at scan time unless
``spark.sql.legacy.bucketedTableScanOutputOrdering`` is set, because
multi-file buckets can't guarantee it. ``write_bucketed`` produces one
file per bucket, so setting that flag additionally elides the Sorts —
CPU-only either way.)

Sizing: pick ``num_buckets`` so one bucket of the LARGER table is
roughly an executor-task unit (128-512 MB). Both sides of a co-located
join MUST use the same bucket count; aggregations on the bucket key
also skip their Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``path`` makes it an external table (data at ``path``, layout
    metadata in the session catalog) — the catalog entry is what lets
    Catalyst elide the join-side Exchange later.
    """
    # pre-shuffle onto the bucket hash (same Murmur3 HashPartitioning
    # the bucket spec uses): each write task then owns exactly one
    # bucket, giving ONE file per bucket. Without it every task writes
    # a sliver of every bucket — num_tasks x num_buckets small files,
    # and multi-file buckets void the sortBy guarantee, so downstream
    # joins would re-Sort even though the data is bucket-sorted.
    df = df.repartition(num_buckets, bucket_col)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key.

    Reads via the catalog (bucket metadata only lives there): with both
    sides bucketed+sorted on ``on``, the physical plan is a
    SortMergeJoin with NO Exchange and NO Sort on either side — every
    task zips bucket i with bucket i."""
    return spark.table(left_table).join(spark.table(right_table), on)

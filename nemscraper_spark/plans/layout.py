"""Clustered parquet layout for data skipping (SURVEY.md §4 — the
reference relies on Hive `date=` pruning only; at 100TB the next lever
is ROW-GROUP pruning inside each partition).

`clustered_write` range-partitions by the clustering columns and sorts
within partitions before writing. Effect: each output file/row-group
covers a narrow, mostly disjoint min-max range of the cluster key, so
any engine that reads parquet statistics (Spark's vectorized reader,
DuckDB, Trino) skips row groups whose [min,max] can't satisfy a filter
— a scan with a selective predicate touches ~1/files of the data
instead of all of it. tests/test_layout.py proves the mechanism from
the footers: clustered ranges are tight/disjoint, unsorted ones all
overlap.

repartitionByRange samples the key distribution, so skew (a hot key)
lands in its own partitions instead of one giant file. This composes
with Hive partitioning: partitionBy(date) for coarse pruning, cluster
by (entity, ts) for fine pruning inside each date.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int = 8,
    partition_by: Sequence[str] | None = None,
) -> None:
    cluster_cols = list(cluster_cols)
    writer = (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
    )
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    writer.parquet(path)

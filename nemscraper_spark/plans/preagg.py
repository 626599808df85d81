"""Mergeable pre-aggregates (continuous-aggregate / rollup pattern).

The reference's dashboards recompute 5-minute bucket sums from raw rows
on every query (grafana/dashboards/fpp.json:1010,1068). At 100 TB the
raw scan dominates every dashboard refresh; the standard fix is a
materialized time-bucket pre-aggregate holding MERGEABLE partial states
(count / sum / min / max — avg derives as sum/count), which any coarser
granularity can be answered from by re-aggregation: partials compose
associatively, so `hour = merge(5min partials)` is exact, not an
approximation.

This module keeps the partial-state bookkeeping in one place so callers
can't mix a non-mergeable aggregate (median, distinct) into a rollup —
those need sketches (see queries/extended_ops.approx_sketches) or the
raw table.

Write path: one shuffle on (bucket, keys), parquet partitioned by date
for pruning. Read path: groupBy over the preagg — input is already
|buckets| x |keys| rows, orders of magnitude below raw.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DECIMAL-accumulated sum: exact integer arithmetic -> the rollup is
# bit-identical to the direct aggregation at ANY merge order/parallelism
# (a double sum would drift between the two plans).
_DEC = "decimal(30,6)"


def build_preagg(
    df: DataFrame,
    time_col: str,
    bucket: str,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Raw rows -> one partial-state row per (bucket_start, *keys)."""
    return (
        df.groupBy(
            F.window(time_col, bucket).start.alias("bucket_start"), *keys
        ).agg(
            F.count(value_col).alias("p_count"),
            F.sum(F.col(value_col).cast(_DEC)).alias("p_sum"),
            F.min(value_col).alias("p_min"),
            F.max(value_col).alias("p_max"),
        )
    )


def rollup_preagg(
    preagg: DataFrame, coarser_bucket: str, keys: Sequence[str]
) -> DataFrame:
    """Merge partial states up to a coarser bucket. Exact for any
    coarser_bucket that is a multiple of the preagg bucket."""
    merged = (
        preagg.groupBy(
            F.window("bucket_start", coarser_bucket).start.alias("bucket_start"),
            *keys,
        ).agg(
            F.sum("p_count").alias("p_count"),
            F.sum("p_sum").alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )
    )
    return finalize(merged)


def finalize(partials: DataFrame) -> DataFrame:
    """Partial states -> user-facing measures."""
    return partials.select(
        *[c for c in partials.columns if not c.startswith("p_")],
        F.col("p_count").alias("n"),
        F.col("p_sum").cast("double").alias("sum_value"),
        (F.col("p_sum").cast("double") / F.col("p_count")).alias("avg_value"),
        F.col("p_min").alias("min_value"),
        F.col("p_max").alias("max_value"),
    )

"""As-of join — Spark has no native one (SURVEY.md §2.3 J7 note; the
reference builds prev/next endpoints with derived-key joins instead,
crunch.rs:385-421).

Implementation: the union-and-carry pattern, pure DataFrame ops — no
Pandas UDF, no per-group python:

    1. tag left (probe) and right (reference) rows, union by name
    2. sort within each key by (ts, right-before-left at ties)
    3. last_value(ignoreNulls) over an unbounded-preceding window
       carries the most recent reference value onto every probe row
    4. keep probe rows

Cost: ONE shuffle on the key (the union sorts within partitions) —
same as a sort-merge join, and strictly better than a range-condition
BNLJ. Skewed keys behave like any window function (AQE handles the
partition sizing; a hot key can additionally be range-chunked by time
like operators/ewma.py's stitch).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with right_ts <= left_ts (direction='backward'; 'forward' =
    earliest right row with right_ts >= left_ts), per ``on`` key.
    Ties (equal timestamps) match, like pd.merge_asof."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    on = list(on)
    value_cols = list(value_cols)

    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(
            *on, F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    if direction == "backward":
        # reference rows sort before probe rows at equal ts so ties match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(c)
            for c in value_cols
        ]

    out_cols = [F.col(c) for c in left.columns] + carried
    return unioned.select(*out_cols, F.col("__side")).filter(
        F.col("__side") == 1
    ).drop("__side")

"""Bucketized range (interval) join — the scale path for J5
(SURVEY.md §2.3; reference files.json:1081 `timeline LEFT JOIN
downloads ON ts >= start AND ts < end`).

A pure non-equi join plans as BroadcastNestedLoopJoin: O(|probe| x
|intervals|) compares and a broadcast requirement on one whole side —
fine for the reference's 5k-row dashboards, fatal at 100TB.

This operator makes it an EQUI-join:

    1. intervals explode to every coarse time bucket they overlap
       (sequence over floor(start/B)..floor((end-1us)/B) — half-open)
    2. probe rows compute their single bucket floor(ts/B)
    3. shuffle equi-join on bucket + residual range predicate

Each (probe, interval) match survives in exactly ONE bucket (the one
containing ts), so no dedup pass is needed. Blow-up is bounded by
interval_len/B + 1 copies per interval; pick B near the typical
interval length. Both sides shuffle-partition on the bucket key, so
the join parallelizes like any aggregation — no broadcast, no
quadratic loop; AQE handles hot buckets like any skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    probe: DataFrame,
    probe_ts: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to every interval with
    ``start <= probe_ts < end`` via a bucket equi-key. ``how`` may be
    'inner' or 'left' (left keeps probe rows with no interval)."""
    if how not in ("inner", "left"):
        raise ValueError(how)
    b_us = int(bucket_seconds) * 1_000_000

    def us(c: str):
        # unix_micros requires TIMESTAMP; cast covers TIMESTAMP_NTZ
        # inputs (both sides go through the same cast, so bucket keys
        # stay consistent under any session timezone)
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = probe.withColumn("__b", F.floor(us(probe_ts) / b_us))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(us(start_col) / b_us),
                F.floor((us(end_col) - 1) / b_us),
            )
        ),
    )
    cond = (
        (p["__b"] == iv["__b"])
        & (p[probe_ts] >= iv[start_col])
        & (p[probe_ts] < iv[end_col])
    )
    return p.join(iv, cond, how).drop("__b")

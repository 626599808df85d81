"""Watermarked stream-stream interval join (attribution).

Beyond the reference (its streams never join — main.rs wires channels
between independent stages): the canonical streaming-analytics pattern
of attributing an action stream to a preceding impression stream, e.g.
"every click joined to the view it followed within N minutes, per
user".

Structured Streaming executes this as a stateful symmetric hash join:
each side buffers rows in the state store only until the other side's
WATERMARK passes the end of the join window, so state is bounded by
(attribution horizon + late-data allowance) x arrival rate — never the
full history. Without both watermarks AND a time-range predicate Spark
(correctly) refuses the query as unbounded-state; this module
encapsulates the contract.

Batch twin: the identical join expression on static DataFrames
(pinned equal in tests/test_streaming_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_to_impression(
    impressions: DataFrame,
    actions: DataFrame,
    key: str = "user_id",
    impression_time: str = "view_ts",
    action_time: str = "click_ts",
    horizon: str = "10 minutes",
    late_allowance: str = "30 minutes",
) -> DataFrame:
    """actions joined to every impression of the same ``key`` whose
    timestamp lies in (action_time - horizon, action_time].

    Works for both streaming inputs (bounded join state, see module
    docstring) and static ones (batch twin). Column names of the two
    inputs must be disjoint apart from ``key``.
    """
    if impressions.isStreaming or actions.isStreaming:
        impressions = impressions.withWatermark(impression_time, late_allowance)
        actions = actions.withWatermark(action_time, late_allowance)
    cond = (
        (impressions[key] == actions[key])
        & (actions[action_time] >= impressions[impression_time])
        & (
            actions[action_time]
            <= impressions[impression_time] + F.expr(f"INTERVAL {horizon}")
        )
    )
    return actions.join(impressions, cond, "inner").drop(impressions[key])

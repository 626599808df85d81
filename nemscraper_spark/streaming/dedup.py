"""Streaming dedup-by-key with bounded state (SURVEY.md §2.8 M1's
semantics on an event stream).

The reference dedups by filename against an ever-growing in-memory
HashSet hydrated from history parquet (table_history.rs:58-92) — state
grows forever. Structured Streaming's `dropDuplicatesWithinWatermark`
keeps the same exactly-once-per-key output while BOUNDING state: a key
is remembered only until the watermark passes its event time + delay,
so state size tracks the late-data horizon, not all of history.

Batch twin: `dropDuplicates(keys)` — identical results when the data
fits one batch (pinned in tests/test_streaming_dedup.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    late_horizon: str = "1 hour",
) -> DataFrame:
    """events: streaming DataFrame; emits the first-seen row per key,
    dropping re-deliveries that arrive within ``late_horizon`` of the
    original (later-than-horizon duplicates are by definition outside
    the source's replay window)."""
    return events.withWatermark(event_time_col, late_horizon).dropDuplicatesWithinWatermark(
        list(keys)
    )

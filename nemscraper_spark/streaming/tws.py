"""Running per-entity aggregates on Spark 4's transformWithState API
(SURVEY.md §2.9 — beyond the reference: its history tables only ever
append + dedup; a scaled deployment also wants LIVE per-entity counters
that update as files/events arrive).

``transformWithStateInPandas`` is the successor to
``applyInPandasWithState`` (streaming/stateful.py shows the older API on
sessionization): typed state handles (Value/List/Map) with optional TTL
live in the state store — RocksDB-backed and key-partitioned on a real
cluster — and the processor emits UPDATED aggregates per key each
micro-batch, so a dashboard reads current totals without rescanning
history.

State is one (count, sum, max) tuple per entity — bounded by
|distinct entities|, not by stream length; a TTL (optional here) evicts
entities gone quiet. Arrow-batched rows in, pandas aggregation per key,
no Python object state outside the store.

Environment note: the TWS python<->JVM state protocol needs
``google.protobuf`` and the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``). This container has
no usable protobuf, so tests/test_tws_streaming.py skips itself there;
on a real cluster both are present. applyInPandasWithState
(streaming/stateful.py) remains the protocol-free fallback.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (count, sum, max) over the whole stream life."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prev = self._agg.get()
        n, s, m = (0, 0.0, None) if prev is None else prev
        for pdf in rows:
            vals = pdf["value"].astype("float64")
            if len(vals) == 0:
                continue
            n += int(len(vals))
            s += float(vals.sum())
            bm = float(vals.max())
            m = bm if m is None else max(m, bm)
        self._agg.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "max_value": [m],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp,
    value double). Returns a streaming DataFrame emitting the UPDATED
    running totals for every entity seen in each micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

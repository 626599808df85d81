"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9 — beyond the reference's
file-arrival micro-batching, this is the event-time stateful surface a
scaled-up deployment needs; batch twin: queries/timeseries.sessionize).

State per user: the open session (start, end, n, sum). An incoming
event either extends it (gap <= threshold) or closes it — closed
sessions are EMITTED, the new one replaces the state. A processing-time
timeout flushes sessions for users that went quiet, so state does not
grow with the key universe's history (bounded by |active users|).

At scale: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by the group key — the same hash shuffle as a
batch groupBy, but incremental per micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
STATE_SCHEMA = "start long, end long, n long, s double"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    idle_flush_ms: int | None = 30000,
    exact_decimal_sums: bool = False,
) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp,
    value double). Returns a streaming DataFrame of CLOSED sessions.

    ``idle_flush_ms=None`` disables the processing-time timeout (open
    sessions then close only when a later event arrives) — use for
    drain-style availableNow runs, where a timeout-only micro-batch
    would otherwise fire at the end of every drain.

    ``exact_decimal_sums=True`` accumulates each session's sum in
    4-dp DECIMAL (the engine-wide dec_sum convention,
    queries/common.py) instead of float — order-independent and
    bit-identical to ``CAST(SUM(CAST(v AS DECIMAL(25,4))) AS DOUBLE)``
    in either engine, which is what lets the streaming operator sit
    behind the driver's cross-engine hash gate."""

    gap_us = gap_seconds * 1_000_000

    def close_sessions(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from decimal import ROUND_HALF_UP, Decimal

        q4 = Decimal("1e-4")

        def dec(x):
            # shortest-repr round trip: a 4dp decimal stored as double
            # reprs back to its exact decimal string, so state survives
            # the double-typed state schema without drift
            return Decimal(repr(float(x))).quantize(q4, ROUND_HALF_UP)

        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.exists:
            start, end, n, s = state.get
        else:
            start, end, n, s = None, None, 0, 0.0
        if exact_decimal_sums and s is not None:
            s = dec(s)

        def add(a, v):
            if exact_decimal_sums:
                return a + dec(v)
            return a + float(v)

        if state.hasTimedOut:
            if start is not None:
                closed.append((start, end, n, float(s)))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("ts", kind="mergesort")
            ts_us = rows["ts"].astype("int64") // 1000  # ns -> us epoch
            vals = rows["value"].astype("float64")
            for t, v in zip(ts_us, vals):
                t = int(t)
                if start is None:
                    start, end, n = t, t, 1
                    s = dec(v) if exact_decimal_sums else float(v)
                elif t - end <= gap_us:
                    end, n, s = max(end, t), n + 1, add(s, v)
                else:
                    closed.append((start, end, n, float(s)))
                    start, end, n = t, t, 1
                    s = dec(v) if exact_decimal_sums else float(v)
            state.update((start, end, n, float(s)))
            if idle_flush_ms is not None:
                state.setTimeoutDuration(idle_flush_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(c[0], unit="us") for c in closed
                    ],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        close_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_flush_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

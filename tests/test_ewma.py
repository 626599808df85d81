"""Pin the recursive EWMA kernel against an independent pure-python
model of the reference recurrence (crunch.rs:243-270):

    fm[i] = (1 - a) * fm[i-1] + a * (-dev[i]),  fm[-1] = 0, reset per key
"""

from __future__ import annotations

from collections import defaultdict

from nemscraper_spark.queries.common import load_table
from nemscraper_spark.queries.timeseries import ewma_per_entity

ALPHA = 2.0 / 9.0


def _python_model(rows):
    """rows: (event_id, user_id, ts, value) → {event_id: ewma}."""
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.user_id].append(r)
    out = {}
    for _, group in by_key.items():
        group.sort(key=lambda r: (r.ts, r.event_id))
        prev = 0.0
        for r in group:
            prev = (1 - ALPHA) * prev + ALPHA * (-r.value)
            out[r.event_id] = prev
    return out


def test_ewma_matches_reference_recurrence(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    expected = _python_model(ev.select("event_id", "user_id", "ts", "value").collect())

    got = {r.event_id: r.ewma_value for r in ewma_per_entity(spark, sf_dir).collect()}
    assert len(got) == len(expected)
    for event_id, want in expected.items():
        assert abs(got[event_id] - want) < 1e-12, event_id


def test_ewma_seed_zero_not_pandas_adjust():
    """The reference seeds fm[-1]=0, so fm[0] = a*x[0] — NOT pandas'
    ewm(adjust=False) which seeds fm[0]=x[0]. Guard the distinction."""
    import numpy as np

    from nemscraper_spark.operators.ewma import _ewma_series

    x = np.array([9.0, 0.0, 0.0])
    out = _ewma_series(x, ALPHA)
    assert abs(out[0] - ALPHA * 9.0) < 1e-15
    assert abs(out[1] - (1 - ALPHA) * ALPHA * 9.0) < 1e-15

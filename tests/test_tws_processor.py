"""Protobuf-free unit test of the TWS RunningTotalsProcessor logic
(streaming/tws.py). The full transformWithStateInPandas path needs
google.protobuf for the python<->JVM state protocol and skips in this
container (tests/test_tws_streaming.py); this module drives the
processor directly with a stubbed ValueState handle so the aggregation
logic — accumulate across batches, per-key isolation, None-state
bootstrap, empty-batch tolerance — is still executed here.
"""

from __future__ import annotations

import pandas as pd

from nemscraper_spark.streaming.tws import RunningTotalsProcessor


class FakeValueState:
    """Mimics the TWS ValueState handle for one grouping key at a time:
    the store is keyed externally (`current_key`), exactly how the real
    state server resolves the implicit current key per
    handleInputRows call."""

    def __init__(self):
        self.store: dict = {}
        self.current_key = None

    def get(self):
        return self.store.get(self.current_key)

    def update(self, value):
        self.store[self.current_key] = tuple(value)


class FakeHandle:
    def __init__(self):
        self.states: dict[str, FakeValueState] = {}

    def getValueState(self, name, schema, ttl_ms=None):
        return self.states.setdefault(name, FakeValueState())


def _drive(proc, state, key, batches):
    """One handleInputRows call for `key`; returns the emitted rows."""
    state.current_key = key
    out = list(proc.handleInputRows((key,), iter(batches), None))
    assert len(out) == 1
    return out[0]


def _batch(values):
    return pd.DataFrame({"user_id": [0] * len(values), "value": values})


def test_running_totals_accumulate_across_batches():
    proc = RunningTotalsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    state = handle.states["agg"]

    r1 = _drive(proc, state, 1, [_batch([1.0, 2.0])])
    assert r1.iloc[0]["n_events"] == 2
    assert r1.iloc[0]["sum_value"] == 3.0
    assert r1.iloc[0]["max_value"] == 2.0

    # second micro-batch continues from stored state
    r2 = _drive(proc, state, 1, [_batch([4.0])])
    assert r2.iloc[0]["n_events"] == 3
    assert r2.iloc[0]["sum_value"] == 7.0
    assert r2.iloc[0]["max_value"] == 4.0
    assert state.store[1] == (3, 7.0, 4.0)


def test_keys_are_isolated():
    proc = RunningTotalsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    state = handle.states["agg"]

    _drive(proc, state, 1, [_batch([10.0])])
    r2 = _drive(proc, state, 2, [_batch([1.0])])
    assert r2.iloc[0]["sum_value"] == 1.0  # key 2 starts fresh
    r1b = _drive(proc, state, 1, [_batch([5.0])])
    assert r1b.iloc[0]["sum_value"] == 15.0
    assert state.store == {1: (2, 15.0, 10.0), 2: (1, 1.0, 1.0)}


def test_multiple_arrow_chunks_in_one_call():
    """The rows iterator yields several pandas chunks per key per batch
    (Arrow batch slicing) — all must fold into one emitted row."""
    proc = RunningTotalsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    state = handle.states["agg"]

    r = _drive(proc, state, 7, [_batch([1.0, 2.0]), _batch([3.0])])
    assert r.iloc[0]["n_events"] == 3
    assert r.iloc[0]["sum_value"] == 6.0
    assert r.iloc[0]["max_value"] == 3.0


def test_empty_chunk_and_max_bootstrap():
    proc = RunningTotalsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    state = handle.states["agg"]

    # an empty chunk alone: count stays 0, max stays None
    r = _drive(proc, state, 3, [_batch([])])
    assert r.iloc[0]["n_events"] == 0
    assert r.iloc[0]["max_value"] is None
    # negative values: max must come from data, not a 0.0 bootstrap
    r2 = _drive(proc, state, 3, [_batch([-5.0, -2.0])])
    assert r2.iloc[0]["max_value"] == -2.0
    assert r2.iloc[0]["sum_value"] == -7.0


def test_matches_batch_groupby_twin():
    """Final per-key totals after replaying all batches equal a plain
    pandas groupBy over the concatenated stream — the same batch-twin
    parity the streaming test asserts through the real engine."""
    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 1, 3, 2],
            "value": [1.0, 2.0, 1.5, 4.0, 8.0, 0.5],
        }
    )
    proc = RunningTotalsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    state = handle.states["agg"]

    # replay as two micro-batches, grouped by key within each
    for lo, hi in ((0, 3), (3, 6)):
        chunk = rows.iloc[lo:hi]
        for key, pdf in chunk.groupby("user_id"):
            _drive(proc, state, int(key), [pdf])

    expect = rows.groupby("user_id")["value"].agg(["count", "sum", "max"])
    for key, row in expect.iterrows():
        n, s, m = state.store[int(key)]
        assert (n, s, m) == (row["count"], row["sum"], row["max"])

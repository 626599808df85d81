"""Property-based check: operators/asof.asof_join must agree with
pandas.merge_asof on arbitrary key/timestamp patterns — including ties
(exact matches), keys with no reference rows, and both directions.

Examples are kept few (each round-trips through Spark) but hypothesis
drives the shapes: duplicate probe timestamps, unmatched keys, empty
reference side.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nemscraper_spark.operators.asof import asof_join

_row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=50),  # ts
    st.integers(min_value=-5, max_value=5),  # value
)


def _expected(left_rows, right_rows, direction):
    lpdf = pd.DataFrame(left_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="mergesort")
    rpdf = (
        pd.DataFrame(right_rows, columns=["k", "rts", "rv"])
        .astype({"k": "int64", "rts": "int64", "rv": "int64"})  # empty-safe
        .drop_duplicates(subset=["k", "rts"], keep="first")
        .sort_values("rts", kind="mergesort")
    )
    merged = pd.merge_asof(
        lpdf,
        rpdf.rename(columns={"rts": "ts"}),
        on="ts",
        by="k",
        direction=direction,
    )
    return sorted(
        (int(r.k), int(r.ts), int(r.v), None if pd.isna(r.rv) else int(r.rv))
        for r in merged.itertuples()
    )


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(_row, min_size=1, max_size=20),
    right_rows=st.lists(_row, max_size=10),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_pandas(spark, left_rows, right_rows, direction):
    # unique (k, rts) on the reference side: with duplicates both
    # engines tie-break arbitrarily, so the property dedupes first
    seen, rr = set(), []
    for k, ts, v in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rr.append((k, ts, v))

    # left rows need a unique id to compare row-by-row
    left = spark.createDataFrame(
        [(i, k, ts, v) for i, (k, ts, v) in enumerate(left_rows)],
        "rid long, k long, ts long, v long",
    )
    right = spark.createDataFrame(rr, "k long, rts long, rv long") if rr else (
        spark.createDataFrame([], "k long, rts long, rv long")
    )
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        value_cols=["rv"],
        direction=direction,
    )
    got = sorted(
        (int(r.k), int(r.ts), int(r.v), None if r.rv is None else int(r.rv))
        for r in out.collect()
    )
    assert got == _expected(left_rows, rr, direction)

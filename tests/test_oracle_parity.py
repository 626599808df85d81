"""Every registered (query, oracle) pair must hash-match DuckDB at
sf0.001 — the same gate the driver applies at sf0.01
(CORRECTNESS_r{N}.json). Queries without an oracle are smoke-checked
for execution + stable schema."""

from __future__ import annotations

import pytest

from nemscraper_spark.queries import REGISTRY
from tests.oracle_harness import compare

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
NO_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, spec.oracle, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_smoke(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) > 0

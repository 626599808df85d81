"""Same oracle-parity gate at sf0.01 — the scale the driver's
CORRECTNESS run uses. Marked slow-ish; still < a few minutes locally."""

from __future__ import annotations

import pytest

from nemscraper_spark.queries import REGISTRY
from tests.oracle_harness import compare

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity_sf001(spark, sf_dir_oracle, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir_oracle)
    ok, msg = compare(df, spec.oracle, sf_dir_oracle)
    assert ok, f"{name}: {msg}"

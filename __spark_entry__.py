"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship FPP performance pipeline on sf0.001
queries()      — every implemented operator from SURVEY.md §2 (+ the
                 training-data ops), one callable per name
oracle_sql()   — DuckDB-dialect equivalents (recursive EWMA included,
                 via a bit-exact recursive CTE); keys without an oracle
                 are the genuinely non-deterministic-SQL ops
                 (hash-seeded MinHash/LSH, approximate ANN/sketches,
                 file-integration round trips) and get the driver's
                 rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nemscraper_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full FPP performance pipeline (SURVEY.md §3.2
    steps 2-5 — spine ⨯ units → prev/next forecast join → linear
    interpolation → deviations → p_lower/p_raise) on sf0.001."""
    from nemscraper_spark.queries.fpp_pipeline import performance

    return performance(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }

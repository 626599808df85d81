"""Query registry plumbing + testdata loading.

Every query is a callable (spark, sf_dir) -> DataFrame registered together
with its DuckDB oracle SQL (or None for non-SQL-expressible operators —
the driver then records a rows-only check; see __spark_entry__.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a (query fn, oracle sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


def dec_sum(col, scale: int = 4, precision: int = 25):
    """SUM(double) that hash-matches across engines.

    A plain double SUM depends on accumulation order (Spark partial aggs
    vs DuckDB's sequential scan), so the last bits differ run to run.
    Casting to DECIMAL first makes the aggregation exact integer
    arithmetic — identical in any engine and at any parallelism — and the
    single DECIMAL→DOUBLE conversion at the end is deterministic. The
    oracle SQL mirrors it as
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col, scale: int = 4, precision: int = 25):
    """AVG(double) via exact DECIMAL sum / COUNT — see dec_sum."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale, precision) / F.count(c)


def oracle_dec_sum(expr: str, scale: int = 4, precision: int = 25) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def oracle_dec_avg(expr: str, scale: int = 4, precision: int = 25) -> str:
    return f"{oracle_dec_sum(expr, scale, precision)} / COUNT({expr})"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; read it as long (legacy nanosAsLong) and
    convert ns → µs with integer division (ns epochs exceed 2^53, so
    float math would corrupt them), yielding TIMESTAMP_NTZ to match the
    other tables' naive timestamps.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return spark.read.parquet(path)

"""Evolved-schema parquet reader (SURVEY.md §1.3, custom code #3).

Spark's mergeSchema handles union-of-fields with compatible types but
FAILS on string-vs-double / string-vs-timestamp conflicts. The
reference resolves those with a supertype lattice on compaction
(compactor.rs:230-256, 335-406):

    Utf8 < Float64          Utf8 < Timestamp      (nullability ORed,
    fields unioned, sorted alphabetically, missing columns null-filled)

Implementation: a metadata-only pyarrow footer pass (like
compactor.rs:199-227 — no data read), then per-file read + cast +
unionByName(allowMissingColumns=True). Ordinary DataFrame code — no
Catalyst extension needed (SURVEY.md §4).

At scale the footer pass is O(|files|) driver-side metadata reads
(parallelizable with a thread pool); the data pass stays fully
distributed and each file group keeps pushdown/pruning because casts
sit above per-group scans, not above a lowest-common-denominator
all-string scan.
"""

from __future__ import annotations

from functools import reduce

import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemscraper_spark.functions import to_nem_timestamp

_STRINGY = {pa.string(), pa.large_string()}


def _rank(t: pa.DataType) -> int:
    if t in _STRINGY:
        return 0
    return 1


def evolve_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Most-evolved of two arrow types under the reference lattice."""
    if a.equals(b):
        return a
    # Utf8 promotes to anything non-string (compactor.rs:230-256)
    if _rank(a) < _rank(b):
        return b
    if _rank(b) < _rank(a):
        return a
    # timestamps: normalize to the NEM fixed offset (compactor.rs:409-427)
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        return pa.timestamp("ms", tz="+10:00")
    # int widening to the wider numeric
    if pa.types.is_integer(a) and pa.types.is_floating(b):
        return b
    if pa.types.is_floating(a) and pa.types.is_integer(b):
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        return pa.int64()
    raise TypeError(f"no supertype for {a} vs {b}")


def evolved_schema(files: list[str]) -> dict[str, pa.DataType]:
    """Union-of-fields + supertype per field across parquet footers,
    alphabetically ordered (compactor.rs:335-406)."""
    fields: dict[str, pa.DataType] = {}
    for f in files:
        sch = pq.read_schema(f)
        for field in sch:
            if field.name in fields:
                fields[field.name] = evolve_types(fields[field.name], field.type)
            else:
                fields[field.name] = field.type
    return dict(sorted(fields.items()))


def _spark_cast(col: str, t: pa.DataType):
    c = F.col(col)
    if pa.types.is_timestamp(t):
        # string source columns hold NEM-format text (chunk.rs:425-444)
        return F.coalesce(
            c.cast("timestamp"), to_nem_timestamp(c.cast("string"))
        ).alias(col)
    if pa.types.is_floating(t):
        return c.cast("double").alias(col)
    if pa.types.is_integer(t):
        return c.cast("long").alias(col)
    if pa.types.is_boolean(t):
        return c.cast("boolean").alias(col)
    return c.cast("string").alias(col)


def read_evolved(spark: SparkSession, files: list[str]) -> DataFrame:
    """Read many parquet files as one DataFrame under the evolved
    schema, null-filling missing columns.

    Files are grouped by their physical schema (footer signature) so
    each group is ONE distributed scan (not |files| jobs), then each
    group is cast to the evolved schema and unioned by name.
    """
    target = evolved_schema(files)
    groups: dict[str, list[str]] = {}
    for f in files:
        sig = pq.read_schema(f).to_string()
        groups.setdefault(sig, []).append(f)

    parts = []
    for group_files in groups.values():
        df = spark.read.parquet(*group_files)
        present = set(df.columns)
        cols = []
        for name, t in target.items():
            if name in present:
                cols.append(_spark_cast(name, t))
            else:
                cols.append(F.lit(None).cast(_spark_cast_type(t)).alias(name))
        parts.append(df.select(*cols))
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)


def _spark_cast_type(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_boolean(t):
        return "boolean"
    return "string"


def list_parquet_files(root: str) -> list[str]:
    """All parquet data files under root (any partition depth)."""
    ds = pa_ds.dataset(root, format="parquet", partitioning="hive")
    return list(ds.files)

"""Local replica of the driver's Spark-vs-DuckDB compare: row count,
column names, and an order-insensitive value comparison. Used by
tests/test_oracle_parity.py to gate every registered oracle pair before
the driver's CORRECTNESS run does."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from nemscraper_spark.queries.common import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, Decimal):
        # deliberately NOT coerced to float: a Decimal-typed oracle
        # column is a schema bug in the oracle SQL (DuckDB decimal
        # literals) that the real driver could flag — surface it here.
        return f"DECIMAL:{v}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _key(row):
    return tuple(
        "None" if v is None else (f"{v:.9e}" if isinstance(v, float) else str(v))
        for v in row
    )


def compare(spark_df, oracle_sql: str, sf_dir: str, float_rel: float = 1e-9):
    """Return (ok, message). Columns are matched by sorted name, rows by
    sorted stringified key — mirroring an order-insensitive hash."""
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(o_cols):
        return False, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    s_rows = spark_df.collect()
    if len(s_rows) != len(o_rows):
        return False, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"

    order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    o_norm = sorted(
        (_key([_norm(r[i]) for i in order]) for r in o_rows)
    )
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_norm = sorted(
        (_key([_norm(r[i]) for i in s_order]) for r in s_rows)
    )
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        if a != b:
            return False, f"first row mismatch at sorted idx {i}:\n  spark={a}\n  duck ={b}"
    return True, f"ok ({len(s_rows)} rows)"

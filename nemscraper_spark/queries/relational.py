"""Projection / filter / scalar-expression operators (SURVEY.md §2.2, P1-P15).

Each query mirrors a reference pattern (citations inline) re-expressed on
the driver's TPC-H-ish tables (FIXTURES.md §D). All expressions are
built-in Catalyst functions — they stay inside whole-stage codegen, and
filters/projections push down to the parquet scan.

Determinism notes for the DuckDB oracle: casts use try_cast (null on
failure, matching the reference's parse-or-null at chunk.rs:211-227) so
results are identical whether or not the hosting session runs ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.functions import clean_str, date_from_filename
from nemscraper_spark.queries.common import fan_out, load_table, register


@register(
    "select_alias",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS line,
           l_extendedprice AS price, l_shipdate AS ship_ts
    FROM lineitem
    """,
    tags=("P1",),
)
def select_alias(spark, sf_dir):
    """P1 column select + rename — crunch.rs:126-129 select/alias."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_shipdate").alias("ship_ts"),
    )


@register(
    "filter_eq",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("P2",),
)
def filter_eq(spark, sf_dir):
    """P2 equality filter — crunch.rs:125 REGIONID=='NSW1'. Pushed to scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("P3",),
)
def filter_in(spark, sf_dir):
    """P3 IN-list filter — calcs.md:80 origin in [AWEFS, ASEFS]."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@register(
    "filter_time_range",
    oracle="""
    SELECT event_id, ts, user_id, value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-01 06:00:00' AND TIMESTAMP '2024-01-02 06:00:00'
    """,
    tags=("P4",),
)
def filter_time_range(spark, sf_dir):
    """P4 time-range filter — the Grafana $__timeFilter macro
    (fpp.json:158) → ts BETWEEN a AND b."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").between("2024-01-01 06:00:00", "2024-01-02 06:00:00")
    ).select("event_id", "ts", "user_id", "value")


@register(
    "project_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           -l_tax AS neg_tax
    FROM lineitem
    """,
    tags=("P5", "P6"),
)
def project_arithmetic(spark, sf_dir):
    """P5/P6 computed columns + negation — crunch.rs:498 deviation =
    measured - reference; calcs.md:82 deviation = -suppressed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (-F.col("l_tax")).alias("neg_tax"),
    )


@register(
    "case_when",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 100 THEN value ELSE 0 END * -1.0 AS p_lower,
           CASE WHEN value > 100 THEN value ELSE 0 END * 2.0  AS p_raise
    FROM events
    """,
    tags=("P7",),
)
def case_when(spark, sf_dir):
    """P7 CASE WHEN — crunch.rs:139-148 p_lower/p_raise =
    when(fm<0).then(fm).otherwise(0) * dev."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.when(F.col("value") < 100, F.col("value")).otherwise(0.0) * -1.0).alias(
            "p_lower"
        ),
        (F.when(F.col("value") > 100, F.col("value")).otherwise(0.0) * 2.0).alias(
            "p_raise"
        ),
    )


@register(
    "coalesce_fill",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_nonneg
    FROM customer
    """,
    tags=("P8",),
)
def coalesce_fill(spark, sf_dir):
    """P8 null coalesce / fill_null — crunch.rs:432-437
    next_target.fill_null(prev_target), fill_null(0.0)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg"
        ),
        F.coalesce(
            F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(
                F.col("c_acctbal")
            ),
            F.lit(0.0),
        ).alias("bal_nonneg"),
    )


@register(
    "cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS DOUBLE) AS line_d,
           CAST(l_orderkey AS VARCHAR) AS okey_s,
           TRY_CAST(l_returnflag AS DOUBLE) AS flag_d
    FROM lineitem
    """,
    tags=("P9", "P12"),
)
def cast_types(spark, sf_dir):
    """P9/P12 casts incl. parse-or-null — crunch.rs:429 cast(Float64);
    chunk.rs:211-227 string→f64 with err→null (try_cast)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("double").alias("line_d"),
        F.col("l_orderkey").cast("string").alias("okey_s"),
        F.expr("try_cast(l_returnflag AS DOUBLE)").alias("flag_d"),
    )


@register(
    "string_clean",
    oracle="""
    SELECT o_orderkey,
           regexp_replace(trim('  "' || o_orderpriority || '"  '), '^"(.*)"$', '\\1') AS cleaned
    FROM orders
    """,
    tags=("P11",),
)
def string_clean(spark, sf_dir):
    """P11 trim + outer-quote strip — clean_str at chunk.rs:21-28,
    exercised by wrapping a column in the quoting it removes."""
    o = load_table(spark, sf_dir, "orders")
    dirty = F.concat(F.lit('  "'), F.col("o_orderpriority"), F.lit('"  '))
    return o.select("o_orderkey", clean_str(dirty).alias("cleaned"))


@register(
    "str_to_double_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_rt
    FROM lineitem
    """,
    tags=("P12",),
)
def str_to_double_roundtrip(spark, sf_dir):
    """P12 string→double parse (round-trip so engine-specific float
    formatting cancels out) — chunk.rs:211-227."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_cast(CAST(l_quantity AS STRING) AS DOUBLE)").alias("qty_rt"),
    )


@register(
    "date_from_filename",
    oracle="""
    SELECT o_orderkey, fname,
           CASE
             WHEN regexp_extract(fname, '(20[0-3][0-9])(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])', 0) <> ''
             THEN concat_ws('-',
                  substr(regexp_extract(fname, '(20[0-3][0-9])(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])', 0), 1, 4),
                  substr(regexp_extract(fname, '(20[0-3][0-9])(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])', 0), 5, 2),
                  substr(regexp_extract(fname, '(20[0-3][0-9])(0[1-9]|1[0-2])(0[1-9]|[12][0-9]|3[01])', 0), 7, 2))
             ELSE 'unknown-date'
           END AS date_part
    FROM (
      SELECT o_orderkey,
             'PUBLIC_DAILY_' || strftime(o_orderdate, '%Y%m%d') || '_0000000367313233.zip' AS fname
      FROM orders
    )
    """,
    tags=("P14",),
)
def date_from_filename_q(spark, sf_dir):
    """P14 date-from-filename — chunk.rs:258-308 YYYYMMDD scan used for
    the Hive date= partition value."""
    o = load_table(spark, sf_dir, "orders")
    fname = F.concat(
        F.lit("PUBLIC_DAILY_"),
        F.date_format("o_orderdate", "yyyyMMdd"),
        F.lit("_0000000367313233.zip"),
    )
    return o.select(
        "o_orderkey",
        fname.alias("fname"),
        date_from_filename(fname).alias("date_part"),
    )


@register(
    "ratio_division",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS disc_ratio
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("P15",),
)
def ratio_division(spark, sf_dir):
    """P15 ratio of aggregates — files.json:86 processed/downloaded.

    Double sums are order-dependent, so both engines sum in exact
    DECIMAL and divide as double — bit-identical results (the same trick
    the oracle uses; see aggregates.py:dec_sum).
    """
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    num = F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(25,6)"))
    den = F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
    return li.groupBy("l_returnflag").agg(
        (num.cast("double") / den.cast("double")).alias("disc_ratio")
    )

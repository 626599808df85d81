"""Aggregations, sorts/limits, set operations (SURVEY.md §2.4, §2.6, §2.7).

All grouped aggregations are declarative groupBy/agg so Catalyst plans
map-side partial aggregation automatically (the reference gets this from
Polars/DuckDB; §4). Double sums go through dec_sum (exact DECIMAL
accumulation → engine- and parallelism-independent results).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.functions import time_bucket
from nemscraper_spark.queries.common import (
    fan_out,
    dec_avg,
    dec_sum,
    load_table,
    oracle_dec_avg,
    oracle_dec_sum,
    register,
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dec_sum("l_quantity")} AS sum_qty,
           {oracle_dec_sum("l_extendedprice")} AS sum_base_price,
           {oracle_dec_sum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
           {oracle_dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           {oracle_dec_avg("l_quantity")} AS avg_qty,
           {oracle_dec_avg("l_extendedprice")} AS avg_price,
           {oracle_dec_avg("l_discount", 6)} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "flagship"),
)
def q1_pricing_summary(spark, sf_dir):
    """A1 groupBy + SUM (TPC-H Q1 shape) — calcs.md:121-127 grouped
    sums; the same shape as the dashboards' 5-min bucket sums."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 6).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount", 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "global_agg",
    oracle=f"""
    SELECT {oracle_dec_sum("o_totalprice")} AS total_price,
           {oracle_dec_avg("o_totalprice")} AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    """,
    tags=("A2", "A3"),
)
def global_agg(spark, sf_dir):
    """A2 global (no-key) aggregate — calcs.md:248-250 single-row
    total interval charge."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        dec_sum("o_totalprice").alias("total_price"),
        dec_avg("o_totalprice").alias("avg_price"),
        F.count("*").alias("n_orders"),
    )


@register(
    "count_per_key",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    tags=("A3",),
)
def count_per_key(spark, sf_dir):
    """A3 COUNT(*) — files.json:86 totals per history table."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "avg_by_time_bucket",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
           {oracle_dec_avg("value")} AS avg_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
    tags=("A4", "A8", "W3"),
)
def avg_by_time_bucket(spark, sf_dir):
    """A4/A8 AVG per time bucket × entity — all.json:138
    AVG(measured_mw) GROUP BY time_bucket, participant."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    return ev.groupBy(
        time_bucket("ts", 3600).alias("bucket"), "event_type"
    ).agg(dec_avg("value").alias("avg_value"), F.count("*").alias("n"))


@register(
    "filtered_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS max_f,
           MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS max_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("A5",),
)
def filtered_agg_pivot(spark, sf_dir):
    """A5 filtered aggregate (pivot shape) — files.json:1081
    MAX(filename) FILTER (WHERE thread=k) ×32."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias("max_f"),
        F.max(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))).alias("max_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", F.lit(1))).alias("n_p"),
    )


@register(
    "dedup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("A6", "W1", "O2"),
)
def dedup_keep_first(spark, sf_dir):
    """A6/W1 keep-first-after-sort (argmax per group) — crunch.rs:338-346
    sort RUN_DATETIME desc → unique([DUID, INTERVAL_DATETIME], First);
    same as fpp.json:187's ROW_NUMBER ... rn=1. Tie-broken on orderkey
    so the result is total-order deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("A7",),
)
def distinct_projection(spark, sf_dir):
    """A7 DISTINCT projection — crunch.rs:372-375 distinct DUIDs."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 100
    """,
    tags=("O2", "O3"),
)
def topk_orders(spark, sf_dir):
    """O3 top-k — files.json:1081 ORDER BY download_end DESC LIMIT 5000.
    Spark plans this as TakeOrderedAndProject (no full sort/shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").desc()).limit(
        100
    ).select("o_orderkey", "o_totalprice")


@register(
    "sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 1000
    """,
    tags=("O1",),
)
def sort_multi(spark, sf_dir):
    """O1 multi-column sort — crunch.rs:158 sort([ts, DUID])."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .limit(1000)
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@register(
    "union_by_name",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, NULL::DOUBLE AS c_acctbal FROM customer
    UNION ALL BY NAME
    SELECT c_custkey, c_acctbal FROM customer
    """,
    tags=("U1",),
)
def union_by_name(spark, sf_dir):
    """U1 union-by-name with missing columns — crunch.rs:203-214
    concat(to_supertypes) across heterogeneous partition files."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_name", "c_nationkey", F.lit(None).cast("double").alias("c_acctbal"))
    b = c.select("c_custkey", "c_acctbal")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "union_all_stacked",
    oracle="""
    SELECT 'orders' AS src, CAST(COUNT(*) AS BIGINT) AS n FROM orders
    UNION ALL
    SELECT 'events' AS src, CAST(COUNT(*) AS BIGINT) AS n FROM events
    """,
    tags=("U2",),
)
def union_all_stacked(spark, sf_dir):
    """U2 UNION ALL stacked metrics — files.json:168 Downloaded ∪
    Processed counts."""
    o = load_table(spark, sf_dir, "orders").agg(F.count("*").alias("n")).select(
        F.lit("orders").alias("src"), "n"
    )
    e = load_table(spark, sf_dir, "events").agg(F.count("*").alias("n")).select(
        F.lit("events").alias("src"), "n"
    )
    return o.unionAll(e)


@register(
    "union_distinct_timeline",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("U3",),
)
def union_distinct_timeline(spark, sf_dir):
    """U3 UNION distinct — files.json:1081 start-ts ∪ end-ts timeline
    CTE."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()

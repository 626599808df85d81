"""Join operators (SURVEY.md §2.3, J1-J7 + M1 anti-join dedup).

Scale notes: dimension tables (region/nation/customer and derived 5-min
aggregates) are explicitly ``F.broadcast`` so the fact side never
shuffles for them; at 100TB the only shuffling joins left are
fact-to-fact composites, which hash-partition on their keys. The range
join J5 keeps its build side small (the reference caps it with LIMIT
5000, files.json:1081) so BNLJ is the right plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.queries.common import (
    dec_avg,
    dec_sum,
    load_table,
    oracle_dec_avg,
    oracle_dec_sum,
    register,
)

_BUCKET_5M_SQL = "time_bucket(INTERVAL '5 minutes', ts)"


def _bucket_5m(col="ts"):
    from nemscraper_spark.functions import time_bucket

    return time_bucket(col, 300)


@register(
    "join_left_single",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    tags=("J1",),
)
def join_left_single(spark, sf_dir):
    """J1 left equi-join single key — crunch.rs:131-137 deviations ⟕
    freq-measure on ts. Customer side broadcast (dimension)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_inner_composite",
    oracle=f"""
    SELECT l.l_orderkey, l.l_partkey, l.l_linenumber, g.grp_qty
    FROM lineitem l
    INNER JOIN (
      SELECT l_orderkey, l_partkey, {oracle_dec_sum("l_quantity")} AS grp_qty
      FROM lineitem GROUP BY l_orderkey, l_partkey
    ) g ON l.l_orderkey = g.l_orderkey AND l.l_partkey = g.l_partkey
    """,
    tags=("J2",),
)
def join_inner_composite(spark, sf_dir):
    """J2 inner equi-join on composite key — crunch.rs:491-497
    trajectory ⋈ SCADA on [ts, DUID].

    When the probe side IS the build side's source (group totals joined
    back onto the same relation), the join reduces to a window aggregate
    over the grouping key: one shuffle + sort instead of two exchanges
    feeding a sort-merge join — measured ~8x faster at sf0.1 and the
    gap widens with data size. The inner-join semantics are preserved
    exactly (every group the window sees has >= 1 row, so no row is
    dropped). Genuine two-relation composite-key joins are exercised by
    `fpp_unit_deviations` (same J2 tag).
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(25,4)"))
        .over(w)
        .cast("double")
        .alias("grp_qty"),
    )


@register(
    "join_expr_prev_next",
    oracle=f"""
    WITH fc AS (
      SELECT {_BUCKET_5M_SQL} AS ts_5m, event_type,
             {oracle_dec_avg("value")} AS target
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_id, e.ts, e.event_type,
           p.target AS prev_target, n.target AS next_target
    FROM events e
    LEFT JOIN fc p ON {_BUCKET_5M_SQL.replace("ts", "e.ts")} = p.ts_5m
                  AND e.event_type = p.event_type
    LEFT JOIN fc n ON {_BUCKET_5M_SQL.replace("ts", "e.ts")} + INTERVAL '5 minutes' = n.ts_5m
                  AND e.event_type = n.event_type
    """,
    tags=("J3", "J7"),
)
def join_expr_prev_next(spark, sf_dir):
    """J3/J7 left joins on expression keys building prev/next
    interpolation endpoints — crunch.rs:385-421 (forecast at trunc(ts,5m)
    and trunc(ts,5m)+5m joined to each 4s tick, suffixed)."""
    ev = load_table(spark, sf_dir, "events")
    fc = (
        ev.groupBy(_bucket_5m("ts").alias("ts_5m"), "event_type")
        .agg(dec_avg("value").alias("target"))
    )
    base = ev.withColumn("ts_5m", _bucket_5m("ts"))
    # fc scales with buckets x entities -> not force-broadcast; AQE
    # converts to broadcast at runtime when it is actually small
    prev = (fc.select(
        F.col("ts_5m"), F.col("event_type").alias("et"), F.col("target").alias("prev_target")
    ))
    nxt = (fc.select(
        (F.col("ts_5m") - F.expr("INTERVAL 5 MINUTES")).alias("ts_5m"),
        F.col("event_type").alias("et"),
        F.col("target").alias("next_target"),
    ))
    return (
        base.join(prev, (base.ts_5m == prev.ts_5m) & (base.event_type == prev.et), "left")
        .drop(prev.ts_5m).drop("et")
        .join(nxt, (base.ts_5m == nxt.ts_5m) & (base.event_type == nxt.et), "left")
        .select("event_id", "ts", "event_type", "prev_target", "next_target")
    )


@register(
    "join_cross_spine",
    oracle="""
    SELECT s.ts, t.event_type
    FROM (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                    TIMESTAMP '2024-01-01 05:59:00',
                                    INTERVAL '1 minute')) AS ts
    ) s
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    """,
    tags=("J4", "W5"),
)
def join_cross_spine(spark, sf_dir):
    """J4/W5 time-spine ⨯ distinct entities — crunch.rs:349-377 (4s
    daily spine ⨯ distinct DUIDs). Spine built with sequence+explode;
    the small distinct side is broadcast."""
    ev = load_table(spark, sf_dir, "events")
    spine = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-01 05:59:00").cast("timestamp"),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts_raw")
        )
        .select(F.col("ts_raw").cast("timestamp_ntz").alias("ts"))
    )
    types = ev.select("event_type").distinct()
    return spine.crossJoin(F.broadcast(types))


@register(
    "join_range_intervals",
    oracle="""
    WITH d AS (
      SELECT event_id AS dl_id, ts AS dl_start, ts + INTERVAL '30 minutes' AS dl_end
      FROM events WHERE event_id % 100 = 0
    ),
    t AS (SELECT DISTINCT time_bucket(INTERVAL '5 minutes', ts) AS ts
          FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00')
    SELECT t.ts, count(d.dl_id) AS active_downloads
    FROM t LEFT JOIN d ON t.ts >= d.dl_start AND t.ts < d.dl_end
    GROUP BY t.ts
    """,
    tags=("J5",),
)
def join_range_intervals(spark, sf_dir):
    """J5 non-equi range join — files.json:1081 timeline ⟕ downloads ON
    ts >= start AND ts < end (state-timeline pivot)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("dl_id"),
        F.col("ts").alias("dl_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("dl_end"),
    )
    t = (
        ev.filter(F.col("ts") < "2024-01-02 00:00:00")
        .select(_bucket_5m("ts").alias("ts"))
        .distinct()
    )
    joined = t.join(
        F.broadcast(d), (t.ts >= d.dl_start) & (t.ts < d.dl_end), "left"
    )
    return joined.groupBy("ts").agg(F.count("dl_id").alias("active_downloads"))


@register(
    "join_dim_cascade",
    oracle=f"""
    SELECT r_name, n_name, {oracle_dec_sum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("J6",),
)
def join_dim_cascade(spark, sf_dir):
    """J6 multi-way join cascade — calcs.md:167-233 residuals ⟕ CF ⟕
    rates cascade."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # orders/customer grow with the fact data — broadcasting them would
    # not survive 100TB; leave those to Catalyst/AQE (sort-merge or
    # runtime-converted broadcast). nation/region are bounded dims →
    # always broadcast.
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return df.groupBy("r_name", "n_name").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "anti_join_history",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM events s WHERE s.event_id % 10 = 0 AND s.event_id = e.event_id
    )
    """,
    tags=("M1",),
)
def anti_join_history(spark, sf_dir):
    """M1 dedup-against-history as left-anti join — compactor.rs:618-630
    / main.rs:177-179 skip files whose key is already in the history
    ledger. 'seen' side broadcast (ledger keys are small)."""
    ev = load_table(spark, sf_dir, "events")
    seen = ev.filter(F.col("event_id") % 10 == 0).select("event_id")
    return ev.join(F.broadcast(seen), "event_id", "left_anti").select(
        "event_id", "user_id", "event_type"
    )


@register(
    "semi_join_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
    tags=("J-semi",),
)
def semi_join_exists(spark, sf_dir):
    """Left-semi join (EXISTS) — complements M1's anti-join; the
    reference's history.get() membership test (table_history.rs:58-92)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {oracle_dec_sum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("J1", "A1", "O3", "flagship"),
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: filter → 3-way join → grouped revenue → top-10.

    The headline multi-join + agg + top-k plan: both join keys arrive
    pre-filtered (segment filter on customer, date filters pushed to
    the orders/lineitem scans), the aggregation is partial-agg'd
    map-side, and the final ORDER BY ... LIMIT collapses to
    TakeOrderedAndProject (no global sort). Customer/orders broadcast
    decisions are left to AQE — both shrink with the filters, and at
    100TB the surviving side still hash-joins on the shuffled key.
    The tie-break columns (o_orderdate, l_orderkey) make the LIMIT cut
    deterministic across engines."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {oracle_dec_sum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("J6", "A1", "flagship"),
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join cascade → per-nation revenue.

    The deepest join pipeline in the suite (J6's cascade on real
    dimension chains): region and nation are genuinely bounded →
    forced broadcast, so the nation/region hops never shuffle the fact
    stream; supplier and the customer⋈orders side are scale-out
    relations and hash-join on their keys with AQE free to broadcast
    whichever side the filters shrink below threshold. The
    c_nationkey = s_nationkey local-supplier condition rides the
    l_suppkey join as a residual filter — no extra exchange."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "join_full_outer_reconcile",
    oracle="""
    WITH o AS (
      SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    ),
    f AS (
      SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n_closed
      FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT COALESCE(o.d, f.d) AS order_date,
           COALESCE(n_open, CAST(0 AS BIGINT)) AS n_open,
           COALESCE(n_closed, CAST(0 AS BIGINT)) AS n_closed,
           CASE WHEN o.d IS NULL THEN 'closed_only'
                WHEN f.d IS NULL THEN 'open_only'
                ELSE 'both' END AS presence
    FROM o FULL OUTER JOIN f ON f.d = o.d
    """,
    tags=("J8", "full-outer"),
)
def join_full_outer_reconcile(spark, sf_dir):
    """FULL OUTER join — the reconciliation shape (the one join type
    the registry hadn't pinned): per-day open-order counts vs per-day
    closed-order counts, keeping days present on EITHER side and
    tagging which.  This is the expected-vs-actual audit every
    ingest/finance pipeline runs (ledger A vs ledger B by key, nulls =
    discrepancies to investigate) — semantically the union of the left-
    and right-anti results stacked on the inner match, in one shuffle.

    Both inputs aggregate BEFORE the join (days, not raw orders, meet
    the full-outer operator), so the outer join's key space is bounded
    by the calendar — at 100 TB the shuffled sides are day-counts, and
    AQE broadcasts whichever reduction lands under threshold.  Counts
    exact BIGINTs; COALESCE defaults only the measure columns, never
    the join key."""
    orders = load_table(spark, sf_dir, "orders")
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_orderdate").alias("d_o"))
        .agg(F.count("*").alias("n_open"))
    )
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_orderdate").alias("d_f"))
        .agg(F.count("*").alias("n_closed"))
    )
    return (
        o.join(f, o.d_o == f.d_f, "full_outer")
        .select(
            F.coalesce("d_o", "d_f").alias("order_date"),
            F.coalesce("n_open", F.lit(0).cast("long")).alias("n_open"),
            F.coalesce("n_closed", F.lit(0).cast("long")).alias("n_closed"),
            F.when(F.col("d_o").isNull(), "closed_only")
            .when(F.col("d_f").isNull(), "open_only")
            .otherwise("both")
            .alias("presence"),
        )
    )

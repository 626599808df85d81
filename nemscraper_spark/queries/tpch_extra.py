"""TPC-H breadth beyond q1/q3/q5/q17/q18: the remaining classic query
SHAPES a reference user would expect an analytics engine to run —
EXISTS/NOT-EXISTS decorrelation, nation-pair flows, market share,
count-of-counts distributions, disjunctive pushdown, view-then-max.

The driver's TPC-H-ish tables carry a column subset (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone), so queries whose
canonical predicates need missing columns are ADAPTED to equivalent
predicates over present columns; each docstring states the deviation.
Every money aggregate uses the DECIMAL-accumulate pattern
(queries/common.py:dec_sum) so hashes are order-independent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries.common import (
    dec_sum,
    load_table,
    oracle_dec_sum,
    register,
)


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
    tags=("A2", "J-semi"),
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: per-priority counts of orders having at least
    one qualifying lineitem, the canonical EXISTS → left-semi-join
    decorrelation.  Deviation: the qualifying predicate is
    l_returnflag = 'R' (the schema has no commit/receipt dates).  At
    scale the order-side date filter pushes to the scan and the semi
    join shuffles only the key column."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    late = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q6_revenue_change",
    oracle=f"""
    SELECT {oracle_dec_sum("l_extendedprice * l_discount", 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("A1", "P2"),
)
def q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 verbatim over the present columns: the pure
    filter-and-sum forecast query — every predicate is scan-pushable
    (date range, discount band, quantity cap) and the plan is one scan
    with a map-side partial sum; the classic demonstration that
    predicate pushdown + columnar pruning alone decide this query's
    cost at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {oracle_dec_sum("volume", 6)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("J1", "A2"),
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  The nation pair predicate is an OR over the two tiny
    broadcast dimension joins — the fact tables join on their keys
    once and the pair filter prunes after the broadcasts, so no
    fact-to-fact shuffle is added by the OR."""
    s, li, o, c, n = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum("volume", 6).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                         AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS volume, n1.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("J1", "A2"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of a region's
    ECONOMY-part revenue per order year — the conditional-sum-ratio
    aggregate.  Both numerator and denominator accumulate as DECIMAL
    in the same pass (one grouped aggregate, no second scan); the
    part/region/nation dims broadcast and the part filter prunes the
    fact join upstream."""
    p, li, s, o, c, n, r = _t(
        spark,
        sf_dir,
        "part",
        "lineitem",
        "supplier",
        "orders",
        "customer",
        "nation",
        "region",
    )
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    j = (
        p.filter(F.col("p_type") == "ECONOMY")
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        j.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            nat.alias("nat_volume"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.col("nat_volume").cast("decimal(25,6)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(25,6)")).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {oracle_dec_sum("amount", 6)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             {_REV} AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("J1", "A2", "P3"),
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: revenue by supplier nation and order year for
    parts matching a name pattern.  Deviation: no partsupp table in
    the driver schema, so profit omits the supplycost term (the join
    tree and the LIKE-pruned part build side are the shape under
    test).  The LIKE filter reduces the broadcast side before any
    fact shuffle."""
    p, li, s, o, n = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    j = (
        p.filter(F.col("p_name").like("%red%"))
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum("amount", 6).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {oracle_dec_sum(_REV, 6)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "A1", "O3"),
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10: top-20 customers by revenue lost to returns in a
    quarter.  Returnflag and date filters push to the scans; the
    top-20 runs as TakeOrderedAndProject over the grouped aggregate —
    no global sort of the customer roll-up."""
    c, o, li, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
            & (F.col("l_returnflag") == "R")
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("J2", "A2"),
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: the count-of-counts distribution — how many
    customers placed k orders each (zero included via the left join).
    Deviation: the order-exclusion predicate is on o_orderpriority
    (no o_comment column).  Two aggregates: the first shuffles on
    custkey, the second on the tiny count domain; COUNT(o_orderkey)
    counts only matched rows so empty customers land in bucket 0."""
    c, o = _t(spark, sf_dir, "customer", "orders")
    oo = o.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(oo, c.c_custkey == oo.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.00 AS DOUBLE) * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                 THEN {_REV} ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST({_REV} AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("J1", "A1"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: percentage of one month's revenue from PROMO parts —
    conditional-ratio aggregate over a broadcast part join, numerator
    and denominator in one DECIMAL pass.  Deviation: p_type here is a
    flat category, so the predicate is equality rather than the
    canonical LIKE 'PROMO%'."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    j = (
        li.filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .join(p, li.l_partkey == p.p_partkey)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return j.agg(
        (
            F.lit(100.00).cast("double")
            * F.sum(promo.cast("decimal(25,6)")).cast("double")
            / F.sum(rev.cast("decimal(25,6)")).cast("double")
        ).alias("promo_revenue")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {oracle_dec_sum(_REV, 6)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    tags=("J1", "A1", "A-scalar"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the quarter's top supplier(s) by revenue — the
    view-then-scalar-max pattern.  The revenue roll-up computes once
    and is reused for both the max (a tiny all-reduce) and the equality
    probe; the DECIMAL-exact totals make the max comparison safe
    (double totals derived identically on both uses)."""
    li, s = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q19_disjunctive_pred",
    oracle=f"""
    SELECT {oracle_dec_sum(_REV, 6)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("J1", "P2"),
)
def q19_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing
    both join sides — the disjunctive-pushdown test.  Deviation: the
    canonical container/shipmode clauses become size/quantity bands
    (columns present).  Catalyst extracts the common p_brand IN set
    toward the part scan; the residual disjunction evaluates post-join
    in codegen."""
    li, p = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "revenue"
        )
    )


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT * FROM customer
      WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.00
      )
    )
    SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntry_band,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE) AS totacctbal
    FROM pos
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    GROUP BY c_nationkey % 7
    """,
    tags=("J-anti", "A-scalar"),
)
def q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average balances with no
    RECENT order (lapsed since 2000 — every custkey has some order in
    this data), rolled up by country band — the scalar-subquery +
    NOT EXISTS (anti-join) combination.  Deviation: the country code
    comes from c_nationkey % 7 (no c_phone column).  The average is a
    DECIMAL-exact scalar broadcast into the filter; the anti join
    shuffles only customer keys against the orders key column."""
    c, o = _t(spark, sf_dir, "customer", "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.00)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    pos = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    no_orders = pos.join(
        recent, pos.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy(
        (F.col("c_nationkey") % 7).cast("long").alias("cntry_band")
    ).agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(25,4)")).cast("double").alias(
            "totacctbal"
        ),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem
    ),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
      FROM part
      JOIN ps ON partkey = p_partkey
      JOIN supplier ON s_suppkey = suppkey
      WHERE p_size = 10
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
    FROM cand c
    WHERE s_acctbal = (
      SELECT MIN(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey
    )
    """,
    tags=("J1", "A-scalar"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per part, the supplier(s) with the minimum
    account balance among the suppliers that actually shipped it — the
    correlated-MIN-subquery decorrelated as a per-key aggregate joined
    back (the execution every engine picks).  Deviation: no partsupp
    table, so the part↔supplier relation derives from DISTINCT
    lineitem pairs and the minimized attribute is s_acctbal (no
    ps_supplycost).  The DISTINCT pair build shuffles the two key
    columns once; everything after joins broadcast-sized sides."""
    li, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    ps = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    cand = (
        p.filter(F.col("p_size") == 10)
        .join(ps, p.p_partkey == ps.partkey)
        .join(s, ps.suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            mins,
            (cand.p_partkey == mins.mk) & (cand.s_acctbal == mins.min_bal),
        )
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey, {oracle_dec_sum("l_extendedprice * l_quantity", 6)} AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM pv
    WHERE value > (
      SELECT CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) * 0.0005 FROM pv
    )
    """,
    tags=("A1", "A-scalar"),
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose inventory value exceeds a fraction
    of the global total — the GROUP BY + HAVING-against-scalar-subquery
    pattern.  Deviation: value = extendedprice x quantity from
    lineitem (no partsupp).  The roll-up computes once; the global
    threshold is a broadcast scalar over the same aggregate, so the
    fact scans once and the filter costs one comparison per part."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        dec_sum(F.col("l_extendedprice") * F.col("l_quantity"), 6).alias("value")
    )
    thresh = pv.agg(
        (
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double") * F.lit(0.0005)
        ).alias("t")
    )
    return (
        pv.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("t"))
        .select("l_partkey", "value")
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("J1", "A2"),
)
def q12_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape: per-category counts split by order priority —
    the two-CASE-sum aggregate.  Deviation: the category is
    l_returnflag (no l_shipmode column) and the date predicate is on
    l_shipdate (no receiptdate).  The year filter pushes to the
    lineitem scan; the join shuffles only surviving keys."""
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    j = o.join(
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        ),
        o.o_orderkey == li.l_orderkey,
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q21_blame_single_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
        )
    ) blamed
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    """,
    tags=("J-semi", "J-anti", "A2"),
)
def q21_blame_single_supplier(spark, sf_dir):
    """TPC-H Q21 shape — the hardest decorrelation in the suite: for
    finished orders, suppliers who were the ONLY one whose line was
    returned while other suppliers participated (EXISTS another
    supplier's line, NOT EXISTS another supplier's returned line).
    Deviation: 'kept waiting' is expressed via l_returnflag (no
    commit/receipt dates).  Both correlated subqueries decorrelate to
    one semi and one anti join on (orderkey + inequality residual);
    all three lineitem passes shuffle on the same orderkey, so at
    scale they co-partition and AQE reuses the exchange."""
    li, o, s = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    blamed = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .distinct()
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN ps ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("A-distinct", "J-anti"),
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers can serve each
    surviving (brand, type, size) bucket, excluding a blacklist — the
    NOT-IN-subquery + COUNT(DISTINCT) pattern.  Deviations: the
    part↔supplier relation derives from DISTINCT lineitem pairs (no
    partsupp) and the 'customer complaints' blacklist is suppliers with
    negative account balance (no s_comment column).  The blacklist is
    tiny → broadcast anti join, never a shuffle; the distinct-pair
    build shuffles two int columns once and COUNT(DISTINCT) reuses that
    partitioning via partial aggregation."""
    li, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        pf.join(ps, pf.p_partkey == ps.l_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH sq AS (
      SELECT l_partkey, l_suppkey,
             {oracle_dec_sum("l_quantity", 6)} AS life_qty,
             {oracle_dec_sum(
                 "CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
                 "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
                 "THEN l_quantity ELSE 0 END", 6)} AS year_qty
      FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN sq ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND life_qty > 3 * year_qty
    """,
    tags=("J-semi", "A2", "A-scalar"),
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in one nation holding excess stock of
    a name-matched part family — the nested IN-subqueries with a
    correlated aggregate threshold.  Deviations: no ps_availqty, so
    'excess' is lifetime shipped quantity exceeding 3x the quantity
    shipped inside the probe year (same correlated-SUM-threshold
    structure); part family is p_name LIKE 'small%'.  The part-key
    filter broadcasts into the lineitem scan as a semi join before the
    groupBy, so the per-(part,supplier) aggregate only ever sees the
    ~1/6 of the fact that matches the family — the same pruning that
    made q17's threshold build scale."""
    li, p, s, n = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    fam = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    year = (F.col("l_shipdate") >= "1996-01-01") & (
        F.col("l_shipdate") < "1997-01-01"
    )
    sq = (
        li.join(F.broadcast(fam), li.l_partkey == fam.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            dec_sum(F.col("l_quantity"), 6).alias("life_qty"),
            dec_sum(
                F.when(year, F.col("l_quantity")).otherwise(F.lit(0.0)), 6
            ).alias("year_qty"),
        )
        .filter(F.col("life_qty") > 3 * F.col("year_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = n.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        s.join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey, "left_semi")
        .join(sq, s.s_suppkey == sq.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )

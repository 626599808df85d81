"""Change-data-capture / dimension-maintenance operators plus the
relational completeness set: MERGE-style upsert, SCD type-2 history
build, fixed-width histogramming, variance outlier flagging, a
corpus-LM quality proxy, typed JSON extraction, the ranking-window
family, INTERSECT/EXCEPT cohorts, the TPC-H Q17 scalar-subquery
shape, and the null-safe equi-join.

These are the incremental-maintenance shapes a reference user runs
around the scraped store (the reference's own history ledger + compactor
are M1/M3/M4; these queries cover the *dimension* side: applying a batch
of changes to a keyed table and versioning attribute drift over time).

Cross-engine determinism notes (same discipline as corpus_ops.py):
integer arithmetic end-to-end where possible, DECIMAL partial sums for
double aggregation (see common.dec_sum), and a SINGLE final
integer-quotient or identically-shaped double expression — no ln/sqrt,
whose libm implementations differ in the last ulp across engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.queries.common import (
    dec_sum,
    fan_out,
    load_table,
    oracle_dec_sum,
    register,
)


@register(
    "merge_upsert_dim",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey AS k,
             {oracle_dec_sum("o_totalprice")} AS delta,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    ),
    tgt AS (
      SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_acctbal >= 0
    )
    SELECT COALESCE(t.k, s.k) AS c_custkey,
           CASE WHEN t.k IS NULL THEN 'insert'
                WHEN s.k IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           CAST(COALESCE(CAST(t.c_acctbal AS DECIMAL(25,4)), 0)
                + COALESCE(CAST(s.delta AS DECIMAL(25,4)), 0)
                AS DOUBLE) AS new_bal,
           COALESCE(s.n_orders, 0) AS n_orders
    FROM tgt t FULL JOIN src s ON t.k = s.k
    """,
    tags=("cdc", "merge"),
)
def merge_upsert_dim(spark, sf_dir):
    """MERGE INTO semantics (upsert a change batch into a keyed dim) as
    one full-outer join + CASE — exactly the plan Delta/Iceberg MERGE
    lowers to. Source = per-customer order totals (the change batch);
    target = the non-negative-balance slice of the customer dim, so all
    three branches fire: matched→update, source-only→insert,
    target-only→keep. DECIMAL arithmetic keeps the merged balance
    hash-exact across engines. At 100 TB this is a single shuffle
    hash-join on the merge key; AQE broadcasts whichever side is small.
    """
    src = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(
            dec_sum("o_totalprice").alias("delta"),
            F.count("*").alias("n_orders"),
        )
    )
    tgt = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .select(F.col("c_custkey").alias("k"), "c_acctbal")
    )
    j = tgt.join(src, on="k", how="full")
    return j.select(
        F.col("k").alias("c_custkey"),
        F.when(F.col("c_acctbal").isNull(), F.lit("insert"))
        .when(F.col("delta").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
        (
            F.coalesce(F.col("c_acctbal").cast("decimal(25,4)"), F.lit(0))
            + F.coalesce(F.col("delta").cast("decimal(25,4)"), F.lit(0))
        )
        .cast("double")
        .alias("new_bal"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


@register(
    "scd2_priority_history",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             LAG(o_orderpriority) OVER w AS prev_p
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM seq WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w2 AS valid_to,
           CAST(LEAD(o_orderdate) OVER w2 IS NULL AS BOOLEAN) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("cdc", "scd2"),
)
def scd2_priority_history(spark, sf_dir):
    """SCD type-2 history build: collapse each customer's order-priority
    stream into versioned rows [valid_from, valid_to) with an is_current
    flag — the standard slowly-changing-dimension shape CDC pipelines
    maintain. Change detection is a LAG over (custkey, date, orderkey)
    — one shuffle on the entity key; both window passes reuse the same
    partitioning, so Spark plans a single Exchange for the whole query.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("prev_p", F.lag("o_orderpriority").over(w))
    changes = seq.filter(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
        F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
    )


@register(
    "histogram_price_buckets",
    oracle=f"""
    SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           {oracle_dec_sum("l_extendedprice")} AS sum_price
    FROM lineitem
    GROUP BY 1
    """,
    tags=("A-histogram",),
)
def histogram_price_buckets(spark, sf_dir):
    """Fixed-width value histogram (5000-wide buckets over
    l_extendedprice) — the data-profiling primitive behind range
    partitioning choices and skew detection. floor(double/literal) is a
    correctly-rounded IEEE op, bit-identical in both engines, so the
    bucket ids hash-match without width_bucket (which DuckDB and Spark
    disagree on at boundaries). Map-side partial aggregation absorbs
    the row volume; the shuffle carries only ~20 bucket rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / 5000).cast("bigint").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        dec_sum("l_extendedprice").alias("sum_price"),
    )


@register(
    "zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(value) AS mean,
             CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
               / COUNT(value) AS ex2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE (e.value - s.mean) * (e.value - s.mean)
          > 4 * (s.ex2 - s.mean * s.mean)
    """,
    tags=("A-outlier",),
)
def zscore_outliers(spark, sf_dir):
    """Per-group 2-sigma outlier flagging without sqrt: compare the
    squared deviation against 4·variance, with mean and E[x²] built
    from exact DECIMAL sums so the threshold doubles are bit-identical
    across engines (sqrt/stddev differ in the last ulp between libms).
    The per-type stats frame is tiny (≤ #event_types rows) — AQE
    broadcasts it, so the fact side never shuffles. This is the
    streaming-telemetry anomaly gate a reference user runs over the
    dispatch tables.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count("value")
        ).alias("mean"),
        (
            F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).cast(
                "double"
            )
            / F.count("value")
        ).alias("ex2"),
        F.count("*").alias("n"),
    )
    j = ev.join(stats, on="event_type")
    dev = F.col("value") - F.col("mean")
    var = F.col("ex2") - F.col("mean") * F.col("mean")
    return j.filter(dev * dev > F.lit(4) * var).select(
        "event_id", "event_type", "value"
    )


@register(
    "bigram_lm_score",
    oracle="""
    WITH big AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ),
    cnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY bg),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(c.c) AS DOUBLE) / (CAST(COUNT(*) AS BIGINT) * MAX(t.n))
             AS lm_score
    FROM big b JOIN cnt c ON b.bg = c.bg CROSS JOIN tot t
    GROUP BY b.doc_id
    """,
    tags=("text-quality", "lm"),
)
def bigram_lm_score(spark, sf_dir):
    """Corpus-LM fluency proxy: a document's average corpus frequency of
    its word bigrams — the cheap stand-in for 'perplexity under a
    unigram/bigram LM' that CCNet-style pipelines bucket documents by.
    Stays in exact integer arithmetic (sum of corpus counts per doc,
    occurrence count, corpus total) until ONE final integer quotient,
    which is a correctly-rounded double — hash-identical across engines
    with no ln(). Plan shape for scale: ONE explode pass collapsed
    immediately to per-(doc, bigram) occurrence counts (the partial
    aggregation absorbs the token fan-out map-side), so the frequency
    join carries distinct (doc, bigram) pairs — not raw occurrences —
    and the corpus total is a one-row rollup of the count table, not a
    second scan. Everything else is equi-join + groupBy AQE can
    re-plan; no collect.
    """
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # per-(doc, bigram) occurrence counts straight off the explode
    db = (
        d.withColumn("w", F.split("text", " "))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> concat_ws(' ', w[i], w[i+1]))"
                )
            ).alias("bg"),
        )
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("k"))
    )
    cnt = db.groupBy("bg").agg(F.sum("k").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    per_doc = (
        db.join(cnt, on="bg")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("c")).alias("sum_c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        (
            F.col("sum_c").cast("double")
            / (F.col("n_bigrams") * F.col("n"))
        ).alias("lm_score"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(props ->> 'k' AS BIGINT) AS k
    FROM events
    WHERE CAST(props ->> 'k' AS BIGINT) >= 50
    """,
    tags=("P-json", "semistructured"),
)
def json_extract_props(spark, sf_dir):
    """Semi-structured extraction: pull a typed field out of the JSON
    `props` column in both the projection and the predicate — the
    schema-on-read path every telemetry/event pipeline needs beside its
    relational columns. get_json_object stays JVM-side (codegen JSON
    path evaluation, no Python); on columnar stores the props column is
    the only extra column read. Every extracted value is hash-checked
    row-level against DuckDB's ->> operator.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .select("event_id", "event_type", "k")
    )


@register(
    "ranking_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(10) OVER w AS BIGINT) AS decile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("W-rank",),
)
def ranking_functions(spark, sf_dir):
    """The full ranking-window family in one pass: rank, dense_rank,
    ntile decile, percent_rank, cume_dist per market segment — the
    leaderboard/decile-bucketing shapes (complements row_number in
    dedup_keep_first and the lead/lag queries). percent_rank and
    cume_dist are integer quotients ((rank-1)/(n-1), n_leq/n), so the
    doubles hash-match across engines. All five functions share ONE
    window spec — a single shuffle + sort computes the whole frame.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(10).over(w).cast("bigint").alias("decile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pkeys AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
    ),
    pavg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE)
                    / COUNT(l_quantity)) AS qty_threshold
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM pkeys)
      GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,4))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_type = 'ECONOMY'
      AND l.l_quantity < a.qty_threshold
    """,
    tags=("A1", "J-scalar-subquery"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape — the correlated SCALAR-SUBQUERY pattern
    (`l_quantity < 0.2 * avg(l_quantity) per part`) decorrelated the
    way every engine executes it: a per-part aggregate joined back to
    the fact. At scale both the threshold build and the probe shuffle
    once on l_partkey and AQE broadcasts the filtered part slice; the
    threshold is DECIMAL-exact so the comparison doubles hash-match.
    The brand/type filter is pushed into the part scan (tiny build
    side) — the fact table is reduced by the join before the
    threshold comparison runs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    # Semi-join the fact to the ~0.1% of part keys that survive the
    # brand/type filter BEFORE the threshold aggregate: at 100 TB the
    # unrestricted groupBy would shuffle the full fact width to build
    # thresholds that are ~99.9% discarded. The probed keys are a
    # subset, so the kept thresholds are value-identical.
    pavg = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
    pavg = pavg.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(25,4)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_threshold")
    )
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pavg, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(25,4)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


@register(
    "set_intersect_except",
    oracle="""
    SELECT 'both' AS cohort, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only' AS cohort, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("U-intersect", "U-except"),
)
def set_intersect_except(spark, sf_dir):
    """The remaining relational set operators: INTERSECT (users who
    clicked AND purchased) and EXCEPT (clicked but never purchased),
    stacked with a cohort tag — the audience-segmentation shape.
    Spark executes both as distinct + left-semi/left-anti hash joins
    on the projected column; at scale that is one shuffle per side on
    user_id and AQE broadcasts the smaller cohort. Both branches read
    the same pushed-down event_type filters.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).select(F.lit("both").alias("cohort"), "user_id")
    # subtract == EXCEPT DISTINCT (exceptAll is the multiset variant,
    # which would keep a clicking user's extra click rows alive)
    only = clicks.subtract(buys).select(
        F.lit("click_only").alias("cohort"), "user_id"
    )
    return both.unionByName(only)


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT event_id, NULLIF(event_type, 'error') AS k FROM events
    ),
    r AS (
      SELECT NULLIF(event_type, 'error') AS k,
             CAST(COUNT(*) AS BIGINT) AS type_total
      FROM events GROUP BY 1
    )
    SELECT l.event_id, l.k AS join_key, r.type_total
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    tags=("J-nullsafe",),
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL instead of dropping — the semantics dimension-lookup
    joins need when 'unknown' is itself a valid key. The 'error' type
    is nullified on both sides, so every error event must still find
    its (NULL-keyed) total. Spark lowers eqNullSafe to an ordinary
    hash/sort-merge join on the coalesced key structure — no nested
    loop — and the grouped right side stays broadcast-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error"))
    left = ev.select("event_id", k.alias("k"))
    right = ev.select(k.alias("k")).groupBy("k").agg(
        F.count("*").alias("type_total")
    )
    return left.join(
        right.withColumnRenamed("k", "rk"), left.k.eqNullSafe(F.col("rk"))
    ).select("event_id", F.col("k").alias("join_key"), "type_total")

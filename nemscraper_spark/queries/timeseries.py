"""Window functions & time-series operators (SURVEY.md §2.5).

The recursive EWMA (W2) is the reference's single computation that
exceeds declarative SQL (crunch.rs:243-270, calcs.md:48-66); it runs as
an Arrow-batched grouped-map (applyInPandas) in
operators/ewma.py. Everything else is pure column algebra.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.functions import epoch_ms, time_bucket
from nemscraper_spark.operators.ewma import ewma
from nemscraper_spark.queries.common import (
    dec_avg,
    dec_sum,
    fan_out,
    load_table,
    oracle_dec_avg,
    oracle_dec_sum,
    register,
)


@register(
    "time_bucket_sums",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS bucket_end,
           {oracle_dec_sum("value")} AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
    tags=("W3", "A8"),
)
def time_bucket_sums(spark, sf_dir):
    """W3 tumbling bucket, end-labelled — fpp.json:1010
    time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes'."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        time_bucket("ts", 300, end_label=True).alias("bucket_end")
    ).agg(dec_sum("value").alias("sum_value"), F.count("*").alias("n"))


@register(
    "interval_arithmetic",
    oracle="""
    SELECT event_id, ts,
           ts - INTERVAL '5 minutes' AS ts_minus_5m,
           time_bucket(INTERVAL '5 minutes', ts) AS ts_5m
    FROM events
    """,
    tags=("W4", "W6"),
)
def interval_arithmetic(spark, sf_dir):
    """W4/W6 truncation + interval arithmetic — crunch.rs:392-396
    trunc(ts,'5m'), ts_5m - 5m."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        (F.col("ts") - F.expr("INTERVAL 5 MINUTES")).alias("ts_minus_5m"),
        time_bucket("ts", 300).alias("ts_5m"),
    )


@register(
    "epoch_extract",
    oracle="SELECT event_id, epoch_ms(ts) AS ts_ms FROM events",
    tags=("W7",),
)
def epoch_extract(spark, sf_dir):
    """W7 epoch milliseconds — crunch.rs:423-428
    .dt().timestamp(Milliseconds)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", epoch_ms("ts").alias("ts_ms"))


@register(
    "linear_interpolation",
    oracle=f"""
    WITH fc AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS ts_5m, event_type,
             {oracle_dec_avg("value")} AS target
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT e.event_id, e.ts, e.event_type,
             time_bucket(INTERVAL '5 minutes', e.ts) AS ts_5m,
             p.target AS prev_target, n.target AS next_target
      FROM events e
      LEFT JOIN fc p ON time_bucket(INTERVAL '5 minutes', e.ts) = p.ts_5m
                    AND e.event_type = p.event_type
      LEFT JOIN fc n ON time_bucket(INTERVAL '5 minutes', e.ts) + INTERVAL '5 minutes' = n.ts_5m
                    AND e.event_type = n.event_type
    )
    SELECT event_id, ts, event_type,
           COALESCE(prev_target, 0.0)
             + (COALESCE(next_target, COALESCE(prev_target, 0.0)) - COALESCE(prev_target, 0.0))
               * ((epoch_ms(ts) - epoch_ms(ts_5m)) / 300000.0) AS reference_value
    FROM base
    """,
    tags=("W8",),
)
def linear_interpolation(spark, sf_dir):
    """W8 linear interpolation between 5-min endpoints —
    crunch.rs:423-440: ref = prev + (next - prev) * frac,
    frac = (ts - trunc(ts,5m)) / 300000, nulls→0."""
    ev = load_table(spark, sf_dir, "events")
    fc = ev.groupBy(
        time_bucket("ts", 300).alias("ts_5m"), "event_type"
    ).agg(dec_avg("value").alias("target"))
    base = ev.withColumn("ts_5m", time_bucket("ts", 300))
    # fc scales with buckets × entities — leave broadcast-vs-shuffle to AQE
    prev = fc.select(
        "ts_5m", F.col("event_type").alias("et"), F.col("target").alias("prev_target")
    )
    nxt = fc.select(
        (F.col("ts_5m") - F.expr("INTERVAL 5 MINUTES")).alias("ts_5m"),
        F.col("event_type").alias("et"),
        F.col("target").alias("next_target"),
    )
    joined = (
        base.join(prev, (base.ts_5m == prev.ts_5m) & (base.event_type == prev.et), "left")
        .drop(prev.ts_5m)
        .drop("et")
        .join(nxt, (base.ts_5m == nxt.ts_5m) & (base.event_type == nxt.et), "left")
    )
    prev_t = F.coalesce(F.col("prev_target"), F.lit(0.0))
    next_t = F.coalesce(F.col("next_target"), prev_t)
    frac = (epoch_ms(F.col("ts")) - epoch_ms(base.ts_5m)) / F.lit(300000.0)
    return joined.select(
        "event_id",
        "ts",
        "event_type",
        (prev_t + (next_t - prev_t) * frac).alias("reference_value"),
    )


@register(
    "running_window_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(25,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("W-running",),
)
def running_window_sum(spark, sf_dir):
    """Running total per entity (files.json:372's cumulative-rate shape)
    via a frame-bounded window — exact DECIMAL accumulation."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "lead_lag_neighbors",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    tags=("W-leadlag",),
)
def lead_lag_neighbors(spark, sf_dir):
    """lead/lag — the alternative construction of J7's prev/next
    endpoints (SURVEY.md §2.5 note)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "sessionize",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
    """,
    tags=("W-session",),
)
def sessionize(spark, sf_dir):
    """Sessionization: lag-gap > 30min starts a new session, cumsum
    numbers them (common OLAP pattern; a batch analogue of
    session_window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run).cast("long"))
        .select("event_id", "user_id", "ts", "session_id")
    )


@register(
    "ewma_per_entity",
    # the recurrence IS SQL-expressible as a recursive CTE; the anchor
    # row spells out om*0 + a*(-v) so its IEEE op sequence (and -0.0
    # handling) is bit-identical to the kernel's loop
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT event_id, user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    rec AS (
      SELECT event_id, user_id, ts, value, rn,
             (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE)) * CAST(0 AS DOUBLE)
               + (CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE)) * (-value) AS ewma_value
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.event_id, o.user_id, o.ts, o.value, o.rn,
             (CAST(1 AS DOUBLE) - CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE)) * r.ewma_value
               + (CAST(2 AS DOUBLE)/CAST(9 AS DOUBLE)) * (-o.value)
      FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT event_id, user_id, ts, value, ewma_value FROM rec
    """,
    tags=("W2",),
)
def ewma_per_entity(spark, sf_dir):
    """W2 recursive EWMA per partition key — crunch.rs:229, 243-270:
    fm[i] = (1-a)*fm[i-1] + a*(-dev[i]), a=2/9, seed 0, reset per key.
    Grouped-map Pandas UDF (operators/ewma.py); see its docstring for
    the at-scale partitioning argument."""
    ev = load_table(spark, sf_dir, "events")
    return ewma(
        ev.select("event_id", "user_id", "ts", "value"),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="value",
        alpha=2.0 / 9.0,
        negate=True,
        out_col="ewma_value",
    )


@register(
    "funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
                     WHEN c.t_click IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS reached_stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
    tags=("funnel", "W-beyond"),
)
def funnel_stages(spark, sf_dir):
    """Ordered-event funnel (view -> click -> purchase): per user, the
    first view, the first click AFTER that view, the first purchase
    AFTER that click, and the furthest stage reached — the product-
    analytics sequence-match pattern.

    Three conditional min-aggregations chained by user_id equi-joins:
    every stage is a partial-aggregated groupBy on the same key, so the
    shuffles co-partition and AQE reuses the exchange; stage tables
    shrink monotonically (funnel!) and broadcast below the threshold.
    No window over full event history — state per user is one
    timestamp per stage, not the event list."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("reached_stage"),
        )
    )


@register(
    "exact_quantiles_by_type",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    tags=("A-quantile",),
)
def exact_quantiles_by_type(spark, sf_dir):
    """EXACT grouped quantiles (p25/median/p75) — the precise
    counterpart of approx_sketches' percentile_approx. Spark's
    percentile() and DuckDB's quantile_cont share the same linear-
    interpolation formula on the sorted group, so the doubles are
    bit-identical (verified, no rounding needed). Exact quantiles sort
    per group — fine for bounded group counts like event types; the
    sketch variant is the path for high-cardinality keys."""
    ev = fan_out(load_table(spark, sf_dir, "events"))
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )


@register(
    "mad_by_type",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS p50
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           MAX(m.p50) AS p50,
           quantile_cont(ABS(e.value - m.p50), 0.5) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
    tags=("A-quantile", "A-robust"),
)
def mad_by_type(spark, sf_dir):
    """Median absolute deviation per group — the robust dispersion
    measure outlier pipelines prefer over stddev (no sqrt, no moment
    blow-up from the very outliers being hunted). Two exact-percentile
    passes: group median, broadcast it back (tiny per-type frame — the
    fact side never shuffles for the join), then the median of absolute
    deviations. percentile() and DuckDB's quantile_cont share the same
    interpolation on the sorted group, and ABS/subtract are exact IEEE
    ops, so the doubles hash-match. Exact per-group sort is fine for
    bounded group counts; approx_sketches is the high-cardinality path.
    """
    ev = fan_out(load_table(spark, sf_dir, "events"))
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50")
    )
    j = ev.join(med, on="event_type")
    return j.groupBy("event_type").agg(
        F.max("p50").alias("p50"),
        F.expr("percentile(abs(value - p50), 0.5)").alias("mad"),
        F.count("*").alias("n"),
    )


@register(
    "covar_value_props",
    oracle="""
    WITH x AS (
      SELECT event_type, value, CAST(props ->> 'k' AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CAST(value * k AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*)
             - (CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(CAST(k AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*))
             AS covar_pop,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM x GROUP BY event_type
    """,
    tags=("A-stats", "P-json"),
)
def covar_value_props(spark, sf_dir):
    """Population covariance between a relational column and a field
    extracted from the JSON props — E[xy] - E[x]E[y] with every sum
    DECIMAL-exact, so the result doubles are bit-identical across
    engines (Spark's covar_pop uses a streaming co-moment update whose
    float order differs run to run — this formulation is both exact
    and portable). One map-side partial aggregation; the JSON
    extraction stays in codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    x = ev.select("event_type", "value", k.alias("k"))
    n = F.count("*")
    return x.groupBy("event_type").agg(
        (
            F.sum((F.col("value") * F.col("k")).cast("decimal(38,12)")).cast("double")
            / n
            - (F.sum(F.col("value").cast("decimal(25,6)")).cast("double") / n)
            * (F.sum(F.col("k").cast("decimal(25,6)")).cast("double") / n)
        ).alias("covar_pop"),
        F.count("*").alias("n"),
    )


@register(
    "range_frame_rolling_sum",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30m
    FROM events
    """,
    tags=("W-range-frame",),
)
def range_frame_rolling_sum(spark, sf_dir):
    """Time-based RANGE window frame: each event's sum of its user's
    values over the trailing 30 minutes — the sliding-aggregate shape
    ROWS frames cannot express when events are irregularly spaced
    (running_window_sum covers the ROWS variant). Both engines order
    and bound the frame on integer MICROSECOND epochs (1800000000 µs),
    so frame membership is exact at the ns-precision timestamps —
    INTERVAL-vs-seconds boundary arithmetic never disagrees — and the
    DECIMAL sum makes the frame aggregation order-independent. One
    shuffle on user_id; the frame scan is a per-partition sliding
    cursor, linear in events.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-1800000000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("rolling_30m"),
    )


@register(
    "locf_forward_fill",
    oracle="""
    SELECT event_id, user_id, ts,
           LAST_VALUE(CASE WHEN event_id % 10 = 0 THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM events
    """,
    tags=("W-locf", "W8"),
)
def locf_forward_fill(spark, sf_dir):
    """LOCF gap fill (last observation carried forward): only every
    10th event carries a reading; every row gets the latest reading at
    or before it, per entity — the step-function fill the reference's
    forecast join relies on (operators/asof.py uses the same kernel:
    last(ignorenulls) over an unbounded-preceding frame), and the
    standard alternative to linear_interpolation's slope fill. The
    carried value is copied, never recomputed, so cross-engine
    equality is exact. One shuffle on the entity key; the frame is a
    running single-value carry, linear per partition.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reading = F.when(F.col("event_id") % 10 == 0, F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(reading, ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "wau_rolling_distinct",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    spine AS (SELECT DISTINCT day FROM du)
    SELECT s.day AS day,
           CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT CASE WHEN d.day = s.day THEN d.user_id END)
                AS BIGINT) AS dau
    FROM spine s JOIN du d ON d.day BETWEEN s.day - 6 AND s.day
    GROUP BY 1
    """,
    tags=("timeseries", "A-distinct", "W-beyond"),
)
def wau_rolling_distinct(spark, sf_dir):
    """Rolling 7-day distinct users per day (WAU) + same-day distinct
    (DAU) — the canonical NON-decomposable rolling metric: COUNT
    DISTINCT over a sliding window can't be merged from daily partials
    (unlike the bitmap/HLL sketches elsewhere in this family), and the
    textbook range join (day BETWEEN target-6 AND target, the oracle's
    shape) is a nested-loop at scale.

    The Spark plan is the EXPLODE-TO-TARGETS trick: dedup to (day,
    user) once, then each row fans out to the <=7 target days it
    contributes to (sequence + explode — pure codegen projection, x7
    row factor, zero nested loop), semi-joins the broadcast observed-
    day spine (so synthetic target days past the horizon drop, exactly
    matching the oracle's spine join), and one groupBy counts distinct
    users per target day.  Shuffle volume is 7x the DEDUPED (day,
    user) pairs — bounded by users x days, not events — and every
    operator is an equi-join or aggregate."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    spine = du.select("day").distinct().withColumnRenamed("day", "tday")
    fanned = du.select(
        "day",
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("tday"),
    )
    return (
        fanned.join(F.broadcast(spine), "tday")
        .groupBy("tday")
        .agg(
            F.count_distinct("user_id").alias("wau"),
            F.count_distinct(
                F.when(F.col("day") == F.col("tday"), F.col("user_id"))
            ).alias("dau"),
        )
        .select(F.col("tday").alias("day"), "wau", "dau")
    )


@register(
    "volume_trend_slope",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) != 0
                THEN CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
                   / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
           END AS slope_per_day,
           CAST(SUM(y) AS BIGINT) AS total_events
    FROM d GROUP BY event_type
    """,
    tags=("timeseries", "stats", "drift"),
)
def volume_trend_slope(spark, sf_dir):
    """Per-type daily-volume TREND: the least-squares slope of daily
    event count vs day index — the drift/growth detector a pipeline
    health monitor runs per source.  Both regression moments (Sxy,
    Sxx) are EXACT BIGINT sums over integer (day, count) pairs — no
    float accumulation anywhere, so the slope is one exact-integer
    expression divided by another and the hash gate can't drift on
    aggregation order (the same reason zscore_outliers uses decimal
    moments; regr_slope's float running sums would not replay).  A
    single-active-day type has den = 0: the slope is undefined, and the
    guarded division yields NULL in BOTH engines (unguarded, non-ANSI
    Spark says NULL while IEEE-mode DuckDB says NaN/inf — a hash split
    waiting for the right data).  Two partial-aggregated groupBys,
    state bounded by types x days."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(F.count("*").alias("y"))
    n = F.count("*")
    num = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")).cast(
        "double"
    )
    den = (n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")).cast(
        "double"
    )
    return d.groupBy("event_type").agg(
        n.alias("n_days"),
        F.when(den != 0, num / den).alias("slope_per_day"),
        F.sum("y").alias("total_events"),
    )

"""Graph analytics over the event stream: user-journey transition
matrix and an iterative PageRank over the transition graph.

The PageRank is the engine's iterative-algorithm showcase alongside
dedup_cluster_components: ranks iterate as FIXED-POINT INTEGERS
(scale 1e9) so every contribution is exact bigint arithmetic — Σ over
in-edges is order-free, `div` floors identically in both engines, and
the driver hash-gates all three unrolled iterations.  Floating-point
PageRank cannot cross the gate (per-group sum order differs between
Spark partial aggregation and any SQL replay); the fixed-point form is
also how integer-only PageRank implementations avoid drift between
runs at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.queries.common import load_table, register

# ------------------------------------------------ transition matrix --

_TRANSITION_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    edges AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM edges
"""


@register("event_transition_matrix", oracle=_TRANSITION_SQL, tags=("W1", "A2"))
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix of user journeys: LAG the
    per-user event sequence, count (prev, next) pairs, row-normalize.
    One shuffle on user_id for the lag, one bounded-key aggregate
    (|types|² cells), and the normalizing window runs over that tiny
    aggregate — at 100 TB the only full-data pass is the lag.  The
    probability is a single division of exact BIGINTs, so it
    hash-matches any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return edges.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    )


# ------------------------------------------------------- pagerank --

# Fixed-point scales: ranks at 1e9, edge probabilities at 1e6.  The
# largest intermediate is 85 * R * P ≈ 85 * 1e9 * 1e6 < 2^63.
_R_SCALE = 1_000_000_000
_P_SCALE = 1_000_000
_DAMP_NUM, _DAMP_DEN = 85, 100  # 0.85 as an exact ratio
_ITERS = 3

_PR_EDGE_SQL = f"""
    seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    ecnt AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    edges AS (
      SELECT src, dst,
             CAST(w * CAST({_P_SCALE} AS BIGINT) // SUM(w) OVER (PARTITION BY src)
                  AS BIGINT) AS p
      FROM ecnt
    ),
    nodes AS (SELECT DISTINCT src AS node FROM ecnt
              UNION SELECT DISTINCT dst FROM ecnt),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST(CAST({_R_SCALE} AS BIGINT) // (SELECT n FROM nn) AS BIGINT) AS r
           FROM nodes)
"""


def _pr_iter_sql(prev: str, out: str) -> str:
    """One PageRank iteration in exact bigint fixed-point:
    r'(v) = base + Σ_u damp * r(u) * p(u,v), every product/division
    floored identically by `//`."""
    return f"""
    {out} AS (
      SELECT n.node,
             CAST(CAST({_DAMP_DEN} - {_DAMP_NUM} AS BIGINT) * {_R_SCALE}
                    // {_DAMP_DEN} // (SELECT n FROM nn) AS BIGINT)
             + CAST(COALESCE(SUM(CAST({_DAMP_NUM} AS BIGINT) * p.r * e.p
                    // {_DAMP_DEN} // {_P_SCALE}), 0) AS BIGINT) AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {prev} p ON p.node = e.src
      GROUP BY n.node
    )"""


_PR_ORACLE = (
    "WITH "
    + _PR_EDGE_SQL
    + ","
    + _pr_iter_sql("r0", "r1")
    + ","
    + _pr_iter_sql("r1", "r2")
    + ","
    + _pr_iter_sql("r2", "r3")
    + """
    SELECT node, r AS rank_fp,
           CAST(r AS DOUBLE) / 1000000000 AS rank
    FROM r3
    """
)


@register("pagerank_event_graph", oracle=_PR_ORACLE, tags=("iterative", "graph"))
def pagerank_event_graph(spark, sf_dir):
    """PageRank over the event-type transition graph, 3 iterations,
    damping 0.85 — the iterative join-aggregate pattern (ranks ⋈ edges
    → groupBy dst) that scales to web-graph size: each iteration is
    one equi-join + one bounded-key aggregate, and Spark's loop body
    is the same DataFrame plan reused with the previous iteration's
    ranks.  Fixed-point bigint ranks (scale 1e9) with floored integer
    products make every iteration exact and order-free, so the driver
    hashes the full 3-step trajectory — the same determinism trick as
    the EWMA decimal kernel, applied to an iterative graph algorithm.
    At real graph scale the per-iteration shuffle partitions by dst;
    here the node set is bounded so AQE broadcasts the rank side."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ecnt = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("w"))
    )
    ws = Window.partitionBy("src")
    edges = (
        ecnt.select(
            "src",
            "dst",
            (F.col("w") * F.lit(_P_SCALE)).cast("long").alias("_num"),
            F.sum("w").over(ws).alias("_den"),
        )
        .select("src", "dst", F.expr("_num div _den").cast("long").alias("p"))
    )
    # Lineage cut (the dup_graph_core_peel pattern): edges is tiny
    # (bounded by the type alphabet) but each LAZY reference re-ran
    # the full events scan + lag-window + aggregate — the unrolled
    # 3-iteration plan held 22 parquet scans / 70 exchanges.  ONE
    # eager localCheckpoint materializes the heavy pipeline once;
    # nodes derives from the checkpointed edges (every ecnt row
    # survives into edges, so src∪dst is identical), and the
    # iterations join scan-free bounded frames (1 scan total).
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # bounded by the type alphabet
    base = ((_DAMP_DEN - _DAMP_NUM) * _R_SCALE) // _DAMP_DEN // n_nodes
    ranks = nodes.withColumn("r", F.lit(_R_SCALE // n_nodes).cast("long"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"CAST({_DAMP_NUM} * r * p div {_DAMP_DEN}"
                    f" div {_P_SCALE} AS BIGINT)"
                ).alias("c"),
            )
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .groupBy("node")
            .agg(
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.sum("c"), F.lit(0)).cast("long")
                ).alias("r")
            )
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(_R_SCALE)).alias("rank"),
    )


@register(
    "event_path_trigrams",
    oracle="""
    WITH s AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 20
    """,
    tags=("graph", "W-leadlag", "O1"),
)
def event_path_trigrams(spark, sf_dir):
    """Sequence mining: the 20 most frequent length-3 event paths over
    per-user timelines — the n-gram generalization of
    event_transition_matrix (bigrams), the shape funnel-discovery and
    session-behavior models start from.  Two LEADs over one
    (user_id)-partitioned sort (a SINGLE exchange+sort serves both),
    one partial-aggregated trigram count (state bounded by
    |event_types|^3, tiny), and a total-order top-20 (count desc, then
    the path itself) that plans as TakeOrdered — no global sort.  The
    (ts, event_id) tie-break makes the sequence total per user, so
    concurrent-timestamp events cannot flip paths between engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )

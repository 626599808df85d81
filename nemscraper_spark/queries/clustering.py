"""Embedding clustering: deterministic Lloyd k-means on DataFrames.

The corpus-curation step the other training-data ops feed: cluster the
embedding space (topic balancing, dedup-aware sampling, curriculum
mixes).  The implementation is the classic scalable Spark shape — the
same one MLlib's KMeans uses under the hood:

  * centroids live on the DRIVER (k × dim doubles — bytes, not data)
    and are shipped into the assignment expression as literals each
    iteration: no join, no shuffle on the assignment pass;
  * the centroid UPDATE is one partial-aggregated groupBy over
    (cluster, dim) — map-side combine reduces each partition to at most
    k × dim cells before the shuffle, so the reduction is O(k·dim) per
    partition regardless of row count: the plan that survives 100 TB.

Everything is bit-deterministic so the whole ITERATIVE algorithm hash-
matches a DuckDB recursive-CTE-style oracle end to end:

  * distances use the sequential-fold dot identity
    d(x,c) = x·x − 2·x·c + c·c with left-associated accumulation —
    the exact float sequence of DuckDB's list_dot_product;
  * argmin tie-breaks on cluster id via array_min over (dist, cluster)
    structs (struct ordering = lexicographic);
  * centroid means accumulate in DECIMAL(25,12) (order-independent
    integer arithmetic — see common.dec_sum) and divide by COUNT(*),
    identically on both engines.

Seeding is data-deterministic (the k lowest vec_ids), iterations fixed,
so same input ⇒ same output on any partitioning/parallelism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries.common import load_table, register

K = 4
ITERS = 2  # assignment rounds; centroids update between them
_DECIMAL = "decimal(25,12)"


def _assign(e, cents):
    """Add an argmin `cluster` column: nearest centroid by
    d = x·x − 2·x·c + c·c, ties to the smaller cluster id.

    `cents` is the driver-side [(cluster_id, [dim doubles])] list,
    captured by value in an Arrow-batched numpy kernel (the flat
    codegen-literal alternative is bit-identical but janino recompiles
    ~seconds of unique 64-term expressions per iteration — the same
    trade pairwise_cosine9 documents).  The kernel accumulates each dot
    dim-in-order (acc += X[:, i] * c[i]) — the exact float sequence of
    a sequential fold / DuckDB's list_dot_product — and np.argmin over
    id-ordered centroid columns ties to the smaller cluster id.
    """
    cent_ids = [cid for cid, _ in cents]
    cent_vecs = [list(c) for _, c in cents]

    def kernel(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cent_vecs, dtype=np.float64)  # (k, dim), id-ordered
        k, dim = C.shape
        cc = np.zeros(k)
        for i in range(dim):
            cc += C[:, i] * C[:, i]
        ids = np.asarray(cent_ids, dtype=np.int64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["x"]])
            xx = np.zeros(n)
            for i in range(dim):
                xx += X[:, i] * X[:, i]
            D = np.empty((n, k))
            for j in range(k):
                xc = np.zeros(n)
                for i in range(dim):
                    xc += X[:, i] * C[j, i]
                D[:, j] = xx - 2 * xc + cc[j]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "x": pdf["x"],
                    "cluster": ids[np.argmin(D, axis=1)],
                }
            )

    return e.mapInPandas(kernel, schema="vec_id long, x array<double>, cluster long")


def _update(assigned):
    """New driver-side centroid list from an assigned frame: per
    (cluster, dim) decimal-exact mean.  Collects k × dim cells."""
    cells = (
        assigned.select("cluster", F.posexplode("x").alias("d", "comp"))
        .groupBy("cluster", "d")
        .agg(
            (
                F.sum(F.col("comp").cast(_DECIMAL)).cast("double") / F.count("*")
            ).alias("v")
        )
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in cells:
        by_cluster.setdefault(r["cluster"], {})[r["d"]] = r["v"]
    return [
        (cid, [dims[d] for d in sorted(dims)])
        for cid, dims in sorted(by_cluster.items())
    ]


def _oracle_assign(src, cents, out):
    return f"""
    {out}_d AS (
      SELECT e.vec_id, {cents}.cluster,
             list_dot_product(e.x, e.x)
               - 2 * list_dot_product(e.x, {cents}.c)
               + list_dot_product({cents}.c, {cents}.c) AS dist
      FROM {src} e CROSS JOIN {cents}),
    {out} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cluster) AS rk
        FROM {out}_d) WHERE rk = 1)"""


def _oracle_update(assign, out):
    return f"""
    {out}_m AS (
      SELECT a.cluster, ex.d,
             CAST(SUM(CAST(ex.comp AS DECIMAL(25,12))) AS DOUBLE)
               / COUNT(*) AS v
      FROM (SELECT vec_id, unnest(x) AS comp,
                   unnest(range(len(x))) AS d FROM e) ex
      JOIN {assign} a USING (vec_id)
      GROUP BY a.cluster, ex.d),
    {out} AS (
      SELECT cluster, list(v ORDER BY d) AS c FROM {out}_m
      GROUP BY cluster)"""


_KMEANS_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
               FROM embeddings),
    c0 AS (SELECT vec_id AS cluster, x AS c FROM e WHERE vec_id < {K}),
    {_oracle_assign("e", "c0", "a1")},
    {_oracle_update("a1", "c1")},
    {_oracle_assign("e", "c1", "a2")}
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM a2
"""


@register("kmeans_embeddings_lloyd", oracle=_KMEANS_ORACLE, tags=("similarity", "cluster"))
def kmeans_embeddings_lloyd(spark, sf_dir):
    """Deterministic Lloyd k-means (k=4, 2 assignment rounds) over the
    embedding column; returns the final (vec_id, cluster) assignment.

    Iterative-algorithm showcase: the driver loop re-plans one scan per
    iteration with refreshed centroid literals; the only shuffle per
    iteration is the k×dim-cell partial aggregation.  Hash-matched
    against the unrolled DuckDB CTE chain (same seeds, same float
    sequences) — see module docstring for the determinism contract.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    cents = [
        (int(r["vec_id"]), [float(v) for v in r["x"]])
        for r in sorted(
            e.filter(F.col("vec_id") < K).collect(), key=lambda r: r["vec_id"]
        )
    ]
    assigned = _assign(e, cents)
    for _ in range(ITERS - 1):
        cents = _update(assigned)
        assigned = _assign(e, cents)
    return assigned.select(
        "vec_id", F.col("cluster").cast("int").alias("cluster")
    )

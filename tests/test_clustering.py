"""Behavior tests for deterministic Lloyd k-means
(queries/clustering.py) beyond the registry-wide oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries import REGISTRY
from nemscraper_spark.queries.clustering import K
from nemscraper_spark.queries.common import load_table


def test_kmeans_assignment_shape(spark, sf_dir):
    out = REGISTRY["kmeans_embeddings_lloyd"].fn(spark, sf_dir)
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    rows = out.collect()
    assert len(rows) == n_emb
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(K))
    assert len(clusters) >= 2  # seeds are distinct vectors; k-means must split


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Same assignment regardless of input parallelism: the decimal
    centroid reduction is order-independent, so re-partitioning the
    input must not change a single label."""
    fn = REGISTRY["kmeans_embeddings_lloyd"].fn
    a = {r["vec_id"]: r["cluster"] for r in fn(spark, sf_dir).collect()}

    import nemscraper_spark.queries.clustering as cl

    orig = cl.load_table

    def repart(spark_, sf_dir_, name):
        return orig(spark_, sf_dir_, name).repartition(7)

    cl.load_table = repart
    try:
        b = {r["vec_id"]: r["cluster"] for r in fn(spark, sf_dir).collect()}
    finally:
        cl.load_table = orig
    assert a == b


def test_kmeans_update_tightens_clusters(spark, sf_dir):
    """Lloyd invariant: after the centroid update, mean distance to the
    assigned centroid must not increase."""
    from nemscraper_spark.queries.clustering import _assign, _update

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("x")
    )
    cents0 = [
        (int(r["vec_id"]), [float(v) for v in r["x"]])
        for r in sorted(
            e.filter(F.col("vec_id") < K).collect(), key=lambda r: r["vec_id"]
        )
    ]

    def mean_dist(cents):
        byid = dict(cents)
        assigned = _assign(e, cents).collect()
        tot = 0.0
        for r in assigned:
            c = byid[r["cluster"]]
            tot += sum((a - b) ** 2 for a, b in zip(r["x"], c))
        return tot / len(assigned)

    a1 = _assign(e, cents0)
    cents1 = _update(a1)
    assert mean_dist(cents1) <= mean_dist(cents0) + 1e-9

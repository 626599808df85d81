"""Independent invariant checks for the corpus-structure analytics
(corpus_graph.py) — brute-force recomputations in plain Python that the
SQL oracles share no code with."""

from __future__ import annotations

import itertools
import math

import numpy as np

from nemscraper_spark.queries import REGISTRY


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Triangles/wedges recomputed from the verified-pair edge list via
    adjacency sets must equal the registered report exactly."""
    from nemscraper_spark.queries.training_data import lsh_verified_pairs_md5
    from nemscraper_spark.queries.common import fan_out, load_table

    d = fan_out(load_table(spark, sf_dir, "documents"))
    edges = {
        (r.doc_a, r.doc_b)
        for r in lsh_verified_pairs_md5(
            d, threshold=0.2, n_perm=16, band_size=4
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    row = REGISTRY["dup_triangle_density"].fn(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)
    assert row.n_triangles == tri
    assert row.n_wedges == wedges
    if wedges:
        assert row.global_clustering == 3 * tri / wedges
    else:
        assert row.global_clustering is None


def test_mutual_knn_matches_numpy_bruteforce(spark, sf_dir):
    """The mutual k-NN edge set recomputed with numpy over the same
    integer grid (exact bigint dots, round-9 cosine, same tie-break)
    must equal the registered graph edge-for-edge."""
    from nemscraper_spark.queries.ann_twins import _int_grid

    grid = {
        r.vec_id: np.asarray(r.e, dtype=np.int64)
        for r in _int_grid(spark, sf_dir).filter("vec_id < 256").collect()
    }
    grid = {k: v for k, v in grid.items() if int(v @ v) > 0}
    ids = sorted(grid)
    knn: dict[int, dict[int, int]] = {}
    for s in ids:
        scored = []
        for t in ids:
            if t == s:
                continue
            dot = int(grid[s] @ grid[t])
            cos = dot / (
                math.sqrt(float(int(grid[s] @ grid[s])))
                * math.sqrt(float(int(grid[t] @ grid[t])))
            )
            # same round-9 HALF_UP the engines apply
            from decimal import ROUND_HALF_UP, Decimal

            cos = float(
                Decimal(repr(cos)).quantize(Decimal("1e-9"), ROUND_HALF_UP)
            )
            scored.append((-cos, t))
        scored.sort()
        knn[s] = {t: i + 1 for i, (_, t) in enumerate(scored[:5])}
    expect = {}
    for s, t in itertools.combinations(ids, 2):
        if t in knn[s] and s in knn[t]:
            expect[(s, t)] = (knn[s][t], knn[t][s])
    got = {
        (r.src, r.dst): (r.rk_ab, r.rk_ba)
        for r in REGISTRY["mutual_knn_graph"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_novelty_curve_invariants(spark, sf_dir):
    """Deciles partition the corpus; ratios are exact count divisions;
    one document's novelty recomputed from raw text matches."""
    rows = REGISTRY["ngram_novelty_curve"].fn(spark, sf_dir).collect()
    assert {r.decile for r in rows} <= set(range(10))
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_ratio == r.n_novel / r.n_shingles
    # cross-check one decile's doc count against the raw table
    from nemscraper_spark.queries.common import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.toPandas()
    m = int(pdf.doc_id.max()) + 1
    with_sh = pdf[
        pdf.text.map(lambda t: len(t.split(" ")) >= 3)
    ]
    per_decile = (with_sh.doc_id * 10 // m).value_counts().to_dict()
    assert {r.decile: r.n_docs for r in rows} == per_decile


def test_df_histogram_partitions_postings(spark, sf_dir):
    """Buckets partition the shingle set; posting shares sum to 1."""
    rows = REGISTRY["shingle_df_histogram"].fn(spark, sf_dir).collect()
    assert len(rows) >= 1
    total = sum(r.n_postings for r in rows)
    assert abs(sum(r.posting_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        lo = 1 << r.df_bucket if r.df_bucket else 0
        assert r.n_shingles >= 1
        assert r.posting_share == r.n_postings / total


def test_core_peel_trajectory_monotone_and_consistent(spark, sf_dir):
    """Peeling can only shrink the graph: edges and nodes are
    non-increasing across rounds, round 0 matches the registered
    verified-pair query's edge count, and a stabilized round (equal
    edge counts) must also have equal node counts."""
    from nemscraper_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["dup_graph_core_peel"].fn(spark, sf_dir).collect(),
        key=lambda r: r.peel_round,
    )
    assert [r.peel_round for r in rows] == [0, 1, 2, 3]
    # minhash_lsh_pairs is the 16x4 production-geometry md5 primary —
    # the exact pipeline the peel builds its edge set from
    n_pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).count()
    assert rows[0].n_edges == n_pairs
    for a, b in zip(rows, rows[1:]):
        assert b.n_edges <= a.n_edges
        assert b.n_nodes <= a.n_nodes
        if b.n_edges == a.n_edges:
            assert b.n_nodes == a.n_nodes

"""Invariant pins for the round-5 operators: the hash-gated recall
report, the LSH band-curve tuning report, and the SemDeDup keep-list
closure (cross-checks the SQL oracles can't express)."""

from __future__ import annotations

from nemscraper_spark.queries import REGISTRY


def test_recall_report_matches_direct_computation(spark, sf_dir):
    """The report's n_hits must equal the literal intersection of the
    LSH twin's top-5 with the exact brute-force top-5 (both already
    driver-hash-gated individually) — and recall is n_hits/5."""
    lsh = {}
    for r in REGISTRY["ann_lsh_cosine_md5"].fn(spark, sf_dir).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    # exact side: the registered float brute force agrees with the
    # int-grid ranking on this data only approximately, so recompute
    # ground truth the report's own way is circular — instead pin the
    # CONTRACT: 0 <= n_hits <= 5, recall = n_hits/5, one row per query,
    # and n_hits can't exceed what the LSH twin returned.
    rows = REGISTRY["ann_lsh_recall_report"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall == r.n_hits / 5
        assert r.n_hits <= len(lsh.get(r.query_id, ()))
    # aggregate floor: same 0.2 recall floor the ANN family pins
    total = sum(r.n_hits for r in rows)
    assert total / (5 * len(rows)) >= 0.2


def test_band_curve_counts_match_registered_queries(spark, sf_dir):
    """Each geometry arm's verified count must equal the row count of
    the registered query that runs that exact geometry + threshold
    (16x4 = minhash_lsh_pairs, 8x2 = minhash_lsh_pairs_md5), and
    verified <= candidates with precision = verified/candidates."""
    arms = {
        r.geometry: r
        for r in REGISTRY["lsh_band_curve_report"].fn(spark, sf_dir).collect()
    }
    assert set(arms) == {"8x2", "16x4"}
    n_16 = REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).count()
    n_8 = REGISTRY["minhash_lsh_pairs_md5"].fn(spark, sf_dir).count()
    assert arms["16x4"].verified == n_16
    assert arms["8x2"].verified == n_8
    for r in arms.values():
        assert r.verified <= r.candidates
        if r.candidates:
            assert r.precision_ == r.verified / r.candidates


def test_semantic_keep_list_closure_is_consistent(spark, sf_dir):
    """Keep-list invariants: one row per corpus vector; every pair
    endpoint from semantic_dedup_clusters is clustered (non-singleton);
    exactly one canonical per component; the canonical is the
    component's min vec_id; singletons are their own component."""
    pairs = REGISTRY["semantic_dedup_clusters"].fn(spark, sf_dir).collect()
    rows = REGISTRY["semantic_dedup_keep_list"].fn(spark, sf_dir).collect()
    n_vecs = (
        REGISTRY["semantic_dedup_keep_list"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/embeddings.parquet")
        .count()
    )
    assert len(rows) == n_vecs
    by_id = {r.vec_id: r for r in rows}
    endpoint_ids = {p.keep_id for p in pairs} | {p.drop_id for p in pairs}
    comps: dict[int, list] = {}
    for r in rows:
        if r.status == "singleton":
            assert r.component == r.vec_id
            assert r.vec_id not in endpoint_ids
        else:
            comps.setdefault(r.component, []).append(r)
    for comp_id, members in comps.items():
        canon = [m for m in members if m.status == "canonical"]
        assert len(canon) == 1
        assert canon[0].vec_id == min(m.vec_id for m in members) == comp_id
    # every pair endpoint landed in some component
    for vid in endpoint_ids:
        assert by_id[vid].status in ("canonical", "dropped")


def test_incremental_delta_equals_full_dedup_restricted(spark, sf_dir):
    """Incremental dedup must find EXACTLY the full-dedup pairs that
    touch the delta slice (same geometry + threshold), re-keyed so the
    new doc is always doc_new — delta-vs-base matches keep the delta
    side as doc_new, delta-vs-delta pairs appear once (matched < new).
    Kind must reflect the matched side's slice."""
    full = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    is_delta = lambda i: i % 5 == 4  # noqa: E731

    expected = {}
    for a, b in full:
        if is_delta(a) and is_delta(b):
            expected[(max(a, b), min(a, b))] = "delta"
        elif is_delta(a):
            expected[(a, b)] = "base"
        elif is_delta(b):
            expected[(b, a)] = "base"
    got = {
        (r.doc_new, r.doc_matched): r.kind
        for r in REGISTRY["dedup_incremental_delta"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_hard_negatives_exclude_anchor_label(spark, sf_dir):
    """Every mined negative must carry a label different from its
    anchor's, ranks must be dense 1..5 per anchor, and cosines must be
    non-increasing in rank (ties broken by neighbor_id)."""
    from nemscraper_spark.queries.common import load_table

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    per_q: dict[int, list] = {}
    for r in REGISTRY["hard_negative_mining"].fn(spark, sf_dir).collect():
        assert r.neg_label == labels[r.neighbor_id]
        assert r.neg_label != labels[r.query_id]
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == 10
    for rows in per_q.values():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == [1, 2, 3, 4, 5]
        for a, b in zip(rows, rows[1:]):
            assert a.cosine > b.cosine or (
                a.cosine == b.cosine and a.neighbor_id < b.neighbor_id
            )


def test_padding_report_accounts_for_every_doc(spark, sf_dir):
    """Buckets are powers of two, every doc lands in exactly one
    bucket, and tokens + padding = bucket capacity per group."""
    from nemscraper_spark.queries.common import load_table

    rows = REGISTRY["length_bucket_padding_report"].fn(spark, sf_dir).collect()
    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        assert r.bucket & (r.bucket - 1) == 0  # power of two
        capacity = r.bucket * r.n_docs
        assert r.total_tokens + r.padding_tokens == capacity
        assert abs(r.waste_ratio - r.padding_tokens / capacity) < 1e-12


def test_epoch_shuffle_is_a_dense_permutation_per_shard(spark, sf_dir):
    """Every (doc, epoch) appears exactly once, shards are 0..7, pos is
    dense 1..|shard| within each (epoch, shard), and the two epochs
    order the corpus differently (seed-stable but epoch-decorrelated)."""
    from nemscraper_spark.queries.common import load_table

    rows = REGISTRY["epoch_shuffle_shards"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == 2 * n_docs
    seen = {(r.doc_id, r.epoch) for r in rows}
    assert len(seen) == len(rows)
    shards: dict[tuple, list] = {}
    for r in rows:
        assert 0 <= r.shard <= 7
        shards.setdefault((r.epoch, r.shard), []).append(r.pos)
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    key = {}
    for r in rows:
        key.setdefault(r.doc_id, {})[r.epoch] = (r.shard, r.pos)
    same = sum(1 for v in key.values() if v[0] == v[1])
    assert same < 0.05 * n_docs  # epochs must not reuse the order

"""Cross-checks between the scalable training-data ops and their exact
baselines (the checks SQL oracles can't express)."""

from __future__ import annotations

from nemscraper_spark.queries import REGISTRY


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_candidates_subset_of_exact(spark, sf_dir):
    """Every LSH-surviving pair must appear in the exact-Jaccard pair
    set with the same threshold (LSH can miss pairs — never invent)."""
    exact = _pairs(REGISTRY["ngram_jaccard_pairs"].fn(spark, sf_dir))
    lsh = _pairs(REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir))
    assert lsh <= exact
    if exact:  # recall report — band geometry should catch most
        recall = len(lsh) / len(exact)
        assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f}"


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    exact = _topk(REGISTRY["cosine_topk_bruteforce"].fn(spark, sf_dir))
    for name, floor in (("ann_lsh_cosine", 0.2), ("ann_ivf_cosine", 0.2)):
        approx = _topk(REGISTRY[name].fn(spark, sf_dir))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= floor, f"{name} recall {hits/total:.2f}"


def test_simhash_similar_docs_close(spark, sf_dir):
    """Near-dup pairs (by exact Jaccard) must have small simhash
    hamming distance vs the corpus median — the property that makes
    simhash banding work."""
    sim = {r.doc_id: r.simhash for r in REGISTRY["simhash_fingerprint"].fn(spark, sf_dir).collect()}
    pairs = _pairs(REGISTRY["ngram_jaccard_pairs"].fn(spark, sf_dir))
    if not pairs:
        return

    def ham(a, b):
        return bin(a ^ b).count("1")

    import itertools
    import statistics

    near = [ham(sim[a], sim[b]) for a, b in pairs]
    ids = sorted(sim)[:60]
    background = [
        ham(sim[a], sim[b]) for a, b in itertools.combinations(ids, 2)
    ]
    assert statistics.mean(near) < statistics.mean(background)

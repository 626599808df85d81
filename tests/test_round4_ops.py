"""Invariant checks for the round-4 operators — the properties the
SQL oracles can't express (conservation, normalization, containment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries import REGISTRY


def test_transition_matrix_rows_normalize(spark, sf_dir):
    """Each from_type's outgoing probabilities must sum to ~1 and the
    edge counts must conserve the total number of transitions (events
    minus one per user with any events)."""
    rows = REGISTRY["event_transition_matrix"].fn(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    for k, s in by_from.items():
        assert abs(s - 1.0) < 1e-9, (k, s)

    from nemscraper_spark.queries.common import load_table

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users


def test_pagerank_conserves_fixed_point_mass(spark, sf_dir):
    """Fixed-point PageRank only loses mass to integer floors: every
    rank is positive and the total stays within (iterations x loss per
    floor x terms) of the scale."""
    rows = REGISTRY["pagerank_event_graph"].fn(spark, sf_dir).collect()
    total = sum(r.rank_fp for r in rows)
    n = len(rows)
    assert all(r.rank_fp > 0 for r in rows)
    # per iteration: <= 1 floor loss per (node base) + per edge term,
    # plus the probability quantization (1e-6 of each edge's share)
    slack = 3 * (n + n * n) + 3 * n * 1000 + n
    assert 0 < 1_000_000_000 - total < max(slack, 10_000_000), total


def test_semantic_dedup_pairs_are_true_near_dups(spark, sf_dir):
    """Every pair SemDeDup keeps must be a genuine near-duplicate under
    the exact float cosine too (the integer grid may shift the 9th
    decimal, never the 2nd)."""
    pairs = REGISTRY["semantic_dedup_clusters"].fn(spark, sf_dir).collect()
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in REGISTRY["dedup_embedding_cosine"].fn(spark, sf_dir).collect()
    }
    for r in pairs:
        assert r.cosine >= 0.4
        # exact query thresholds at 0.4 as well; allow boundary slack
        c = exact.get((r.keep_id, r.drop_id))
        assert c is None or abs(c - r.cosine) < 0.01


def test_audio_energy_frames_partition_the_stream(spark, sf_dir):
    """Per-doc frame sample counts must sum to the doc's char count and
    frame indices must be dense from 0 — no sample dropped or double
    counted by the framing kernel."""
    from nemscraper_spark.queries.common import load_table

    frames = REGISTRY["multimodal_audio_energy"].fn(spark, sf_dir)
    per_doc = frames.groupBy("doc_id").agg(
        F.sum("n_samples").alias("n"),
        F.count("*").alias("nf"),
        F.max("frame_idx").alias("mx"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("len")
    )
    j = per_doc.join(d, "doc_id").collect()
    assert j
    for r in j:
        assert r.n == r.len, (r.doc_id, r.n, r.len)
        assert r.mx == r.nf - 1  # dense 0..nf-1


def test_audio_energy_kernel_handles_unicode(spark, sf_dir):
    """The fake-PCM decode iterates CHARACTERS (code points), not
    bytes: non-ASCII text must neither crash (the old encode('ascii')
    did) nor mis-frame (utf-8 bytes would over-count multi-byte
    chars).  Checked against a pure-python ord() oracle — the same
    char-indexed semantics the DuckDB oracle's ascii(substr(..))
    uses."""
    import numpy as np

    from nemscraper_spark.queries.corpus_extra import audio_energy_frames

    texts = [
        (1, "héllo wörld " * 30),        # latin-1 accents
        (2, "日本語のテキストです。" * 40),  # CJK
        (3, "mixed ascii + ünïcode 🎵" * 25),  # astral plane
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def expect(text):
        s = np.array([ord(c) for c in text], dtype=np.int64) - 80
        out = {}
        for f in range((len(s) + 255) // 256):
            seg = s[f * 256 : (f + 1) * 256]
            out[f] = (len(seg), int((seg * seg).sum()))
        return out

    got = {}
    for r in audio_energy_frames(df).collect():
        got.setdefault(r.doc_id, {})[r.frame_idx] = (r.n_samples, r.energy_sq)
    for doc_id, text in texts:
        assert got[doc_id] == expect(text), doc_id


def test_pca_power_iteration_climbs_rayleigh_quotient(spark, sf_dir):
    """Random-ish embeddings have a near-degenerate spectrum
    (lambda1/lambda2 ~ 1.07 here), so 3 iterations cannot isolate the
    top EIGENVECTOR — the correct convergence measure is the Rayleigh
    quotient, which power iteration drives monotonically toward
    lambda1: the fixed-point v3 must capture most of lambda1 and beat
    the all-ones start by a wide margin."""
    import numpy as np

    from nemscraper_spark.queries.ann_twins import _int_grid

    rows = REGISTRY["embedding_pca_power_iteration"].fn(spark, sf_dir).collect()
    v = np.zeros(64)
    for r in rows:
        v[r.dim] = r.component
    X = np.stack(
        [np.asarray(r.e, dtype=np.float64) for r in _int_grid(spark, sf_dir).collect()]
    )
    G = X.T @ X
    lam1 = np.linalg.eigvalsh(G)[-1]

    def rq(u):
        return (u @ G @ u) / (u @ u)

    v0 = np.full(64, 1000.0)
    assert rq(v) > rq(v0) * 1.2
    assert rq(v) >= 0.75 * lam1, (rq(v), lam1)

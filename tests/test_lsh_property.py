"""Property-based cross-engine equivalence for the md5-LSH primary
path: for ARBITRARY tiny corpora (random words, random lengths,
deliberate near-dups via shared prefixes), the Spark pipeline at the
production band geometry must produce byte-identical pairs to the
DuckDB oracle SQL generated for the same geometry — the same gate the
driver applies to the fixed testdata, driven by random inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nemscraper_spark.queries.training_data import (
    _LSH_JACCARD_TAIL,
    _lsh_md5_cand_sql,
    lsh_verified_pairs_md5,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

_doc = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(docs=_corpus, dup_of=st.integers(min_value=0, max_value=7))
def test_md5_lsh_matches_oracle_on_random_corpora(spark, docs, dup_of):
    import duckdb
    import pandas as pd

    # guarantee at least one near-dup pair exists sometimes: append a
    # copy of one doc with a one-word suffix
    if docs:
        src = docs[dup_of % len(docs)]
        docs = [*docs, (src + " zeta").strip()]
    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs, "lang": "en", "source": "s"}
    )

    sdf = spark.createDataFrame(pdf)
    got = {
        (r.doc_a, r.doc_b): (r.n_common, round(r.jaccard, 9))
        for r in lsh_verified_pairs_md5(
            sdf.select("doc_id", "text"), threshold=0.2, n_perm=16, band_size=4
        ).collect()
    }

    con = duckdb.connect()
    con.register("documents", pdf)
    sql = _lsh_md5_cand_sql(16, 4) + _LSH_JACCARD_TAIL.format(t=0.2)
    want = {
        (a, b): (n, round(j, 9))
        for a, b, n, j in con.execute(sql).fetchall()
    }
    assert got == want

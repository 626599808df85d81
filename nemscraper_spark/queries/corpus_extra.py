"""Round-4 corpus/training-pipeline breadth: clustered semantic dedup
(the SemDeDup scale path), a linear quality classifier, tokenizer
fertility diagnostics, char-class corpus QC, and embedding pooling.

Reference parity note: nemscraper (the reference) has no corpus surface
— these extend the LLM-training-data side of the engine the same way
the corpus_ops/corpus_health modules do.  Papers: Abbas et al. 2023
(SemDeDup) for the cluster-bucketed embedding dedup; Joulin et al. 2016
(fastText) for the linear quality-classifier shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nemscraper_spark.queries.common import load_table, register
from nemscraper_spark.queries.ann_twins import (
    _COS9,
    _IV_SQL,
    _MD5_SAMPLE,
    _int_grid,
    _md5_sample_rows,
)

# ------------------------------------------------- semantic dedup --

_SEMDEDUP_ORACLE = f"""
    WITH {_IV_SQL},
    cents AS ({_MD5_SAMPLE.format(idx="cid", n=8)}),
    asg AS (
      SELECT vec_id, e, cid FROM (
        SELECT v.vec_id, v.e, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.e, c.e) DESC, c.cid) AS rnk
        FROM iv v, cents c
      ) WHERE rnk = 1
    ),
    pairs AS (
      SELECT a.cid, a.vec_id AS keep_id, b.vec_id AS drop_id,
             {_COS9.format(q="a.e", c="b.e")} AS cosine
      FROM asg a JOIN asg b
        ON b.cid = a.cid AND a.vec_id < b.vec_id
    )
    SELECT cid, keep_id, drop_id, cosine
    FROM pairs WHERE cosine >= 0.4
"""


@register(
    "semantic_dedup_clusters", oracle=_SEMDEDUP_ORACLE, tags=("dedup", "similarity")
)
def semantic_dedup_clusters(spark, sf_dir):
    """SemDeDup's scale path (Abbas et al. 2023): cluster the corpus
    with a coarse quantizer, then search for near-duplicate pairs ONLY
    within each cluster — the O(n^2) all-pairs cosine (which
    dedup_embedding_cosine pins exactly) becomes O(n^2 / k) with
    recall bounded by the quantizer, the only way embedding dedup runs
    at billions of documents.  Deterministic twin machinery from
    ann_twins (integer grid + md5-sampled centroids) makes the whole
    thing hash-checkable: assignment, within-cluster pair generation,
    and the exact-int cosine threshold all replay in SQL.  The
    within-cluster self-join is an equi-join on cid — no cross join —
    and each pair costs one exact integer dot."""
    e = _int_grid(spark, sf_dir)
    cmat = _md5_sample_rows(e, 8)

    def assign_fn(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cmat, dtype=np.float64)  # integer-valued: exact
        kc = C.shape[0]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["e"]])
            dots = X @ C.T
            order = np.lexsort((np.tile(np.arange(kc), (n, 1)), -dots), axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "cid": order[:, 0].astype("int64"),
                    "e": pdf["e"],
                }
            )

    asg = e.mapInPandas(assign_fn, schema="vec_id long, cid long, e array<long>")
    a = asg.select(
        "cid", F.col("vec_id").alias("keep_id"), F.col("e").alias("qe")
    )
    b = asg.select(
        "cid", F.col("vec_id").alias("drop_id"), F.col("e").alias("ce")
    )
    pairs = a.join(b, "cid").filter(F.col("keep_id") < F.col("drop_id"))

    def idot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    cosine = F.round(
        idot(F.col("qe"), F.col("ce")).cast("double")
        / (
            F.sqrt(idot(F.col("qe"), F.col("qe")).cast("double"))
            * F.sqrt(idot(F.col("ce"), F.col("ce")).cast("double"))
        ),
        9,
    )
    return (
        pairs.select("cid", "keep_id", "drop_id", cosine.alias("cosine"))
        .filter(F.col("cosine") >= 0.4)
    )


# -------------------------------------------- linear quality score --

# fastText-style linear classifier over interpretable features, with
# FIXED literal weights (a trained model's coefficients would ship the
# same way).  Feature math is single-division ratios of exact BIGINT
# counts and the margin is one left-associated fused expression, so
# both engines produce bit-identical doubles.
_QC_W = {
    "bias": -1.5,
    "stopword_ratio": 4.0,
    "avg_token_span": 0.12,
    "digit_ratio": -2.0,
    "len_norm": 0.8,
}

_QC_ORACLE = f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to)\\b')) AS BIGINT) AS n_stop,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
      FROM documents
    )
    SELECT doc_id,
           ROUND({_QC_W["bias"]}
             + {_QC_W["stopword_ratio"]} * (CAST(n_stop AS DOUBLE) / n_tokens)
             + {_QC_W["avg_token_span"]} * (CAST(n_chars AS DOUBLE) / n_tokens)
             + {_QC_W["digit_ratio"]} * (CAST(n_digit AS DOUBLE) / n_chars)
             + {_QC_W["len_norm"]} * (CAST(n_chars AS DOUBLE) / 1000), 9) AS margin,
           CASE WHEN {_QC_W["bias"]}
             + {_QC_W["stopword_ratio"]} * (CAST(n_stop AS DOUBLE) / n_tokens)
             + {_QC_W["avg_token_span"]} * (CAST(n_chars AS DOUBLE) / n_tokens)
             + {_QC_W["digit_ratio"]} * (CAST(n_digit AS DOUBLE) / n_chars)
             + {_QC_W["len_norm"]} * (CAST(n_chars AS DOUBLE) / 1000) > 0
             THEN 1 ELSE 0 END AS quality_pred
    FROM feat
"""


@register("quality_classifier_linear", oracle=_QC_ORACLE, tags=("text", "quality"))
def quality_classifier_linear(spark, sf_dir):
    """Linear quality classifier (the fastText-shaped scorer most
    training pipelines run after the rule filters): margin = w·x over
    interpretable per-doc features — stopword ratio, token span, digit
    density, normalized length — with literal coefficients standing in
    for a trained model's.  Pure column algebra: one scan, zero
    shuffles, whole-stage codegen; at 100 TB this is the cheapest
    per-doc op in the pipeline.  quality_filter_gopher pins the RULE
    path; this pins the learned-score path the same corpus runs."""
    d = load_table(spark, sf_dir, "documents")
    n_stop = F.expr(
        r"size(regexp_extract_all(text, '\\b(the|a|and|of|to)\\b', 0))"
    ).cast("long")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    n_chars = F.length("text").cast("long")
    n_digit = (
        F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ).cast("long")
    margin = (
        F.lit(_QC_W["bias"])
        + F.lit(_QC_W["stopword_ratio"]) * (n_stop.cast("double") / n_tokens)
        + F.lit(_QC_W["avg_token_span"]) * (n_chars.cast("double") / n_tokens)
        + F.lit(_QC_W["digit_ratio"]) * (n_digit.cast("double") / n_chars)
        + F.lit(_QC_W["len_norm"]) * (n_chars.cast("double") / F.lit(1000))
    )
    return d.select(
        "doc_id",
        F.round(margin, 9).alias("margin"),
        F.when(margin > 0, F.lit(1)).otherwise(F.lit(0)).alias("quality_pred"),
    )


# ------------------------------------------- tokenizer diagnostics --

_FERTILITY_ORACLE = f"""
    WITH t AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens) AS chars_per_token,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS tokens_per_doc
    FROM t GROUP BY lang
"""


@register("tokenizer_fertility_by_lang", oracle=_FERTILITY_ORACLE, tags=("text",))
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility report: chars-per-token and tokens-per-doc
    by language — the diagnostic that decides whether a tokenizer
    under-serves a language (high fertility → more tokens per content
    unit → that language pays more of the context budget).  Exact
    BIGINT sums (order-free) with single-division ratios; one scan +
    one bounded-key aggregate."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.sum("n_tokens")).alias(
            "chars_per_token"
        ),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("tokens_per_doc"),
    )


# ------------------------------------------------ char-class QC --

_CHAR_CLASS_ORACLE = """
    WITH c AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
             CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_space
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_chars) AS alpha_ratio,
           CAST(SUM(n_digit) AS DOUBLE) / SUM(n_chars) AS digit_ratio,
           CAST(SUM(n_space) AS DOUBLE) / SUM(n_chars) AS space_ratio,
           CAST(SUM(n_chars - n_alpha - n_digit - n_space) AS DOUBLE)
             / SUM(n_chars) AS other_ratio
    FROM c GROUP BY source
"""


@register("char_class_profile", oracle=_CHAR_CLASS_ORACLE, tags=("text", "quality"))
def char_class_profile(spark, sf_dir):
    """Per-source character-class composition (alpha / digit / space /
    other ratios) — the cheap corpus-QC panel that catches a source
    gone bad (markup explosions, binary leakage, numeric dumps) before
    any expensive filter runs.  Counting by delete-and-measure keeps
    every count an exact BIGINT; ratios are single divisions over
    order-free sums.  One scan, one bounded-key aggregate."""
    d = load_table(spark, sf_dir, "documents")

    def n_class(pattern):
        return (
            F.length("text") - F.length(F.regexp_replace("text", pattern, ""))
        ).cast("long")

    c = d.select(
        "source",
        F.length("text").cast("long").alias("n_chars"),
        n_class("[A-Za-z]").alias("n_alpha"),
        n_class("[0-9]").alias("n_digit"),
        n_class(" ").alias("n_space"),
    )
    tc = F.sum("n_chars")
    return c.groupBy("source").agg(
        tc.alias("total_chars"),
        (F.sum("n_alpha").cast("double") / tc).alias("alpha_ratio"),
        (F.sum("n_digit").cast("double") / tc).alias("digit_ratio"),
        (F.sum("n_space").cast("double") / tc).alias("space_ratio"),
        (
            F.sum(
                F.col("n_chars") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space")
            ).cast("double")
            / tc
        ).alias("other_ratio"),
    )


# -------------------------------------------- embedding pooling --

_MEAN_POOL_ORACLE = """
    SELECT label, CAST(t.i - 1 AS INTEGER) AS pos,
           CAST(SUM(CAST(e[t.i] AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS mean_val,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) s,
         UNNEST(generate_series(1, 64)) AS t(i)
    GROUP BY label, t.i
"""


@register("embedding_mean_pool_by_label", oracle=_MEAN_POOL_ORACLE, tags=("similarity",))
def embedding_mean_pool_by_label(spark, sf_dir):
    """Mean-pooled class centroids: the element-wise average embedding
    per label — the pooling step behind prototype classifiers,
    cluster-centroid seeding, and chunk→document embedding rollups.
    posexplode fans each vector to (pos, component) rows ONCE and the
    per-(label, pos) mean is a DECIMAL-exact partial aggregate: the
    shuffle carries only label×64 keys, never vectors, which is the
    shape that survives a billion-vector corpus."""
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select("label", F.col("pos"), F.col("col").alias("v"))
    return x.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(25,10)")).cast("double") / F.count("*")
        ).alias("mean_val"),
        F.count("*").alias("n_vecs"),
    ).select("label", F.col("pos").cast("int").alias("pos"), "mean_val", "n_vecs")

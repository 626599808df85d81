"""Round-3 corpus-health / training-data operators.

Closes remaining gaps in the LLM-data-pipeline surface: SimHash-based
near-dup PAIRING (the fingerprint existed; the scalable band-join that
turns it into candidate pairs didn't), language-ID quality reporting,
duplicate-cluster statistics, cross-source contamination, per-dimension
embedding statistics (the pre-pass ANN/quantization needs), interval
union/merge coverage, and windowed rolling medians.

Every query has a full DuckDB oracle and follows the repo's scale
rules: no self-joins on hot keys without a distinct/group reduction
first, DECIMAL accumulation for order-independent float sums,
map-side-partial-friendly aggregations, and band-bucket joins for the
pairing steps (linear in corpus size, geometry-bounded candidates).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nemscraper_spark.queries.common import (
    REGISTRY,
    fan_out,
    load_table,
    register,
)
from nemscraper_spark.operators.asof import asof_join
from nemscraper_spark.queries.corpus_ops import _BUCKET_SQL, _md5_bucket
from nemscraper_spark.queries.training_data import (
    _LSH_MD5_CAND_SQL,
    lang_id_heuristic,
    lsh_counted_pairs_md5,
)

# ------------------------------------------------------------------ dedup --


_SIMHASH60_HEXVAL = (
    "(ascii({c}) - CASE WHEN ascii({c}) >= 97 THEN 87 ELSE 48 END)"
)

@register(
    "simhash_near_dup_pairs",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    bits AS (
      SELECT doc_id, (p - 1) * 4 + j AS bit,
             CAST(SUM(CASE WHEN (({_SIMHASH60_HEXVAL.format(c="substr(md5(w), p, 1)")}) // POWER(2, j)::INT) % 2 = 1
                      THEN 1 ELSE -1 END) AS BIGINT) AS s
      FROM words,
           UNNEST(generate_series(1, 15)) AS tp(p),
           UNNEST(generate_series(0, 3)) AS tj(j)
      GROUP BY doc_id, bit
    ),
    sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id, simhash, t.b AS band,
             (simhash >> (15 * t.b)) & 32767 AS chunk
      FROM sim, UNNEST(generate_series(0, 3)) AS t(b)
    ),
    pairs AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
      FROM b x JOIN b y
        ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
    """,
    tags=("dedup", "simhash"),
)
def simhash_near_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs at scale: 60-bit fingerprint (15 md5 hex
    digits × 4 vote bits; bit 63 avoided so neither engine hits signed
    overflow) → 4 bands of 15 bits → bucket-join on (band, chunk) →
    verify hamming ≤ 3 on the full fingerprint. Pigeonhole: any pair
    within hamming 3 has ≥1 clean band, so the band join is
    RECALL-COMPLETE for the ≤3 threshold — unlike MinHash banding this
    is exact, not probabilistic. The 15-bit chunk space (32k values per
    band) keeps bucket sizes ~n/32k — the Manku et al. (WWW'07) sizing;
    the 32-bit fingerprint of `simhash_fingerprint` would put only 256
    values per band and make candidates O(n²/256), a quadratic trap at
    corpus scale. Candidate density on THIS synthetic corpus is still
    high because the docs genuinely are similar (shared small
    vocabulary) — cost the oracle pays identically. The verify is one
    codegen'd bit_count per candidate.

    The fingerprint itself is an Arrow kernel (mapInPandas), not the
    former explode → 60-aggregate chain (r11 optimization, guide
    §4.2): the 60 conditional SUMs plus the 60-term reassembly
    generated a fresh multi-thousand-line janino compile per
    invocation and needed a (doc_id) exchange for the vote aggregate,
    while the kernel computes each doc's votes locally in one pass —
    integer arithmetic only, so the fingerprints are bit-identical
    (pinned by the unchanged oracle), and one whole shuffle drops out
    of the plan at every scale.  Null texts are filtered exactly as
    the old explode dropped them.

    r12 (guide §4.2, "hand whole batches to vectorized native
    libraries"): the r11 kernel looped per doc / per word / per hex
    digit in Python and re-md5'd every occurrence of every word.  Now
    each DISTINCT word in the task is hashed exactly once (memoized
    dict across batches within the task), the 15-digit→60-vote unpack
    is one numpy pass over all new digests, per-doc vote totals are a
    single segmented ``np.add.reduceat`` over the gathered ±1 vote
    matrix, and the fingerprint assembly is one matmul against the
    bit-weight vector.  Votes are the same integer sums in a
    different order — bit-identical fingerprints (oracle unchanged,
    pinned by test_simhash_kernel_vectorized_bit_identical)."""
    d = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return _simhash_pairs_from(_simhash60_fingerprints(d))


def _simhash60_fingerprints(d):
    """60-bit SimHash fingerprints (doc_id, simhash) via the vectorized
    Arrow kernel; ``d`` must carry (doc_id, text).  Null texts drop."""

    def fp(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        vocab: dict = {}  # word -> row index in the vote matrix
        parts: list = []  # growing list of (k, 60) int8 ±1 vote blocks
        cache = {"B": None}  # concatenated matrix, rebuilt on growth
        bit_w = np.left_shift(np.int64(1), np.arange(60, dtype=np.int64))

        def register(words):
            """Hash every not-yet-seen word once, vectorized."""
            new = sorted(words.difference(vocab))
            if not new:
                return
            dig = np.frombuffer(
                b"".join(hashlib.md5(w.encode()).digest() for w in new),
                dtype=np.uint8,
            ).reshape(len(new), 16)
            # hexdigest digit p = byte p//2, high nibble when p even
            digits = np.empty((len(new), 15), dtype=np.uint8)
            digits[:, 0::2] = dig[:, :8] >> 4
            digits[:, 1::2] = dig[:, :7] & 15
            bits = (digits[:, :, None] >> np.arange(4, dtype=np.uint8)) & 1
            parts.append(
                (bits.reshape(len(new), 60).astype(np.int8) << 1) - 1
            )
            base = len(vocab)
            for k, w in enumerate(new):
                vocab[w] = base + k
            cache["B"] = None

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            word_sets = [set(t.split(" ")) for t in pdf["text"]]
            register(set().union(*word_sets))
            if cache["B"] is None:
                cache["B"] = (
                    parts[0] if len(parts) == 1 else np.concatenate(parts)
                )
            counts = np.fromiter(
                (len(s) for s in word_sets), dtype=np.int64, count=n
            )
            idx = np.fromiter(
                (vocab[w] for s in word_sets for w in s),
                dtype=np.int64,
                count=int(counts.sum()),
            )
            bounds = np.zeros(n, dtype=np.int64)
            np.cumsum(counts[:-1], out=bounds[1:])
            # segmented per-doc vote sum (every doc has >= 1 distinct
            # word — ''.split(' ') is [''] — so bounds strictly increase)
            votes = np.add.reduceat(
                cache["B"][idx].astype(np.int32), bounds, axis=0
            )
            out = (votes > 0).astype(np.int64) @ bit_w
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "simhash": out}
            )

    return d.filter(F.col("text").isNotNull()).mapInPandas(
        fp, schema="doc_id long, simhash long"
    )


def _simhash_pairs_from(sim):
    """Band-join + hamming verify over (doc_id, simhash) fingerprints."""
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(simhash, {15 * b}) & 32767").alias(
                            "chunk"
                        ),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    la = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "band", "chunk",
    )
    lb = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "band", "chunk",
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)").cast("long")
    return (
        la.join(lb, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


# Winnowing fingerprint per doc (same kernel as doc_winnow_fingerprint:
# min md5 over all char-16-gram shingles — robust to small edits, so
# near-identical docs collapse to one key even when no EXACT duplicate
# exists, which is the realistic corpus shape).
_WINNOW_FP_SQL = """
      SELECT doc_id, source, MIN(md5(substr(text, i, 16))) AS winnow_fp
      FROM documents, UNNEST(generate_series(1, length(text) - 15)) AS t(i)
      WHERE length(text) >= 16
      GROUP BY doc_id, source
"""


def _winnow_fp(spark, sf_dir):
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 16
    )
    return d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 15),"
                " i -> md5(substr(text, i, 16)))"
            )
        ).alias("h"),
    ).groupBy("doc_id", "source").agg(F.min("h").alias("winnow_fp"))


@register(
    "dup_cluster_size_histogram",
    oracle=f"""
    WITH fp AS ({_WINNOW_FP_SQL}),
    g AS (
      SELECT winnow_fp, CAST(COUNT(*) AS BIGINT) AS sz
      FROM fp GROUP BY winnow_fp
    )
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM g GROUP BY sz
    """,
    tags=("dedup", "corpus-health"),
)
def dup_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster size histogram — the corpus-health number a
    dedup run is judged by (how much of the corpus sits in clusters of
    size 2, 3, …). Cluster key = winnowing fingerprint, so clusters
    capture near-identical docs, not just byte-exact ones (this corpus
    has zero exact dups but ~14% fingerprint-level near-dups). After
    the fingerprint kernel: two map-side-partial aggregations on
    bounded keys, no joins — at 100 TB the same linear hash-agg as
    dedup_exact."""
    fp = _winnow_fp(spark, sf_dir)
    g = fp.groupBy("winnow_fp").agg(F.count("*").alias("sz"))
    return g.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


@register(
    "cross_source_contamination",
    oracle=f"""
    WITH fp AS ({_WINNOW_FP_SQL}),
    d AS (SELECT DISTINCT winnow_fp, source FROM fp),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b, a.winnow_fp
      FROM d a JOIN d b
        ON a.winnow_fp = b.winnow_fp AND a.source < b.source
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM p GROUP BY source_a, source_b
    """,
    tags=("dedup", "corpus-health"),
)
def cross_source_contamination(spark, sf_dir):
    """Cross-source contamination matrix: for every source pair, how
    many distinct winnow fingerprints appear in both — the report that
    decides which crawl snapshots to drop before training. Skew-safe
    by construction: (fingerprint, source) is DISTINCT-reduced BEFORE
    the self-join, so a text repeated m times within a source costs one
    row, and a hot fingerprint's join fan-out is bounded by the number
    of SOURCES (a fixed small dimension), never by its duplicate
    count."""
    fp = _winnow_fp(spark, sf_dir)
    hs = fp.select("winnow_fp", "source").distinct()
    a = hs.select("winnow_fp", F.col("source").alias("source_a"))
    b = hs.select("winnow_fp", F.col("source").alias("source_b"))
    return (
        a.join(b, "winnow_fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_fps"))
    )


# ------------------------------------------------------------------- text --


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH pred AS ({REGISTRY["lang_id_heuristic"].oracle})
    SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY actual_lang, predicted_lang
    """,
    tags=("text", "corpus-health"),
)
def lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix (actual × predicted counts) — the
    eval table that calibrates the lang-ID heuristic before it gates a
    corpus. Reuses lang_id_heuristic's per-doc scoring (pure codegen
    regex counts) and adds one bounded-cardinality aggregation."""
    pred = lang_id_heuristic(spark, sf_dir)
    return pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count("*").alias("n")
    )


# ------------------------------------------------------------- embeddings --


@register(
    "embedding_dim_stats",
    oracle="""
    SELECT CAST(t.i - 1 AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e[t.i] AS DECIMAL(25,10))) AS DOUBLE) AS sum_val,
           CAST(SUM(CAST(e[t.i] AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS mean_val,
           CAST(MIN(e[t.i]) AS DOUBLE) AS min_val,
           CAST(MAX(e[t.i]) AS DOUBLE) AS max_val
    FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings) s,
         UNNEST(generate_series(1, 64)) AS t(i)
    GROUP BY t.i
    """,
    tags=("similarity", "corpus-health"),
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding statistics (n/sum/mean/min/max) — the
    normalization pre-pass every ANN index and quantizer needs (PQ and
    int8 quantization both calibrate on per-dim ranges). posexplode →
    one map-side-partial aggregation on a 64-value key: linear scan,
    no shuffle skew possible, output size = dim count. DECIMAL
    accumulation keeps the sums order-independent so the mean is
    bit-identical at any parallelism (dim count is data-dependent in
    production; the probe uses this table's fixed 64)."""
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    dims = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    sum_dec = F.sum(F.col("v").cast("decimal(25,10)")).cast("double")
    return dims.groupBy("dim").agg(
        F.count("*").alias("n"),
        sum_dec.alias("sum_val"),
        (sum_dec / F.count("*")).alias("mean_val"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )


# ------------------------------------------------------------- timeseries --


@register(
    "interval_merge_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 300 SECOND AS e FROM events
    ),
    g AS (
      SELECT user_id, s, e,
             CASE WHEN MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS brk
      FROM iv
    ),
    sid AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM g
    ),
    merged AS (
      SELECT user_id, island, MIN(s) AS m_start, MAX(e) AS m_end
      FROM sid GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(epoch_us(m_end) - epoch_us(m_start)) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
    tags=("W-islands", "timeseries"),
)
def interval_merge_coverage(spark, sf_dir):
    """Interval union/merge: each event opens a 5-minute activity
    interval; per user, overlapping/touching intervals merge and the
    query reports merged-interval count + total covered microseconds —
    the classic coverage/attribution operator (uptime, ad exposure,
    sensor validity windows). The merge is the running-max island
    pattern: an interval starts a new island iff its start exceeds the
    max end seen so far. One shuffle on user_id; windows and both
    aggregations reuse that partitioning, and island state is O(1) per
    row — at 100 TB this is a single repartition + linear pass."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECOND")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("e").over(w_prev)
    brk = F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sid = iv.select(
        "user_id", "s", "e", F.sum(brk).over(w_run).alias("island")
    )
    merged = sid.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    span_us = F.unix_micros(
        F.col("m_end").cast("timestamp")
    ) - F.unix_micros(F.col("m_start").cast("timestamp"))
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(span_us).alias("covered_us"),
    )


@register(
    "rolling_median_window",
    oracle="""
    SELECT event_id, user_id, ts, value,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med7
    FROM events
    """,
    tags=("W4", "timeseries"),
)
def rolling_median_window(spark, sf_dir):
    """Rolling 7-row median per user — the robust-smoothing twin of
    running_window_sum (medians shrug off the spikes that wreck rolling
    means). Spark's `percentile` and DuckDB's `quantile_cont` share the
    same interpolated-quantile definition, so the hash gate is exact.
    One shuffle on user_id; the frame is row-bounded so state per
    window is O(7)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("percentile(value, 0.5)").over(w).alias("med7"),
    )


@register(
    "minhash_containment_pairs",
    oracle=_LSH_MD5_CAND_SQL
    + """
    SELECT i.doc_a, i.doc_b, i.n_common,
           CAST(i.n_common AS DOUBLE) / LEAST(ca.n, cb.n) AS containment
    FROM inter i
    JOIN cnt ca ON ca.doc_id = i.doc_a
    JOIN cnt cb ON cb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.5
    """,
    tags=("dedup",),
)
def minhash_containment_pairs(spark, sf_dir):
    """Containment near-dup pairs (Broder's c(A,B) = |A∩B| / |A|,
    reported symmetrically as n_common / min(|A|,|B|)): catches the
    near-SUPERSET duplicates Jaccard misses — a short doc fully
    embedded in a longer one has low Jaccard (union is large) but
    containment ≈ 1, the common shape when a crawl re-wraps an article
    with boilerplate. Same md5-LSH verify machinery as
    minhash_lsh_pairs_md5 (lsh_counted_pairs_md5 — linear banding,
    equi-join count verify, no per-doc shingle arrays), different
    verify measure over the same (n_common, na, nb) counts."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = lsh_counted_pairs_md5(d)
    cont = F.col("n_common").cast("double") / F.least(
        F.col("na"), F.col("nb")
    )
    return (
        pairs.filter(cont >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            cont.alias("containment"),
        )
    )


@register(
    "contamination_rate_report",
    oracle=f"""
    WITH b AS ({_BUCKET_SQL}),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS ngram
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(generate_series(1, len(w) - 3)) AS t(i)
      WHERE len(w) >= 4
    ),
    test_sh AS (
      SELECT DISTINCT ngram FROM sh JOIN b USING (doc_id) WHERE bucket >= 230
    ),
    hits AS (
      SELECT DISTINCT sh.doc_id
      FROM sh JOIN b USING (doc_id) JOIN test_sh USING (ngram)
      WHERE b.bucket < 204
    ),
    train AS (
      SELECT d.doc_id, d.source FROM documents d
      JOIN b USING (doc_id) WHERE b.bucket < 204
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(h.doc_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(h.doc_id) AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
    GROUP BY t.source
    """,
    tags=("decontaminate", "corpus-health"),
)
def contamination_rate_report(spark, sf_dir):
    """Per-source contamination RATE — the governance report behind
    decontaminate_train_ngrams' row-level flags: for each source, what
    fraction of its train-split docs share a 4-gram with the eval
    split. Same broadcast eval-n-gram join (the eval side is always
    small), then one bounded-cardinality aggregation; the train side
    never shuffles on the n-gram key. This is the number that decides
    whether a source is dropped, re-scraped, or surgically filtered."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    sh = (
        d.withColumn("w", F.split("text", " "))
        .filter(F.size("w") >= 4)
        .select(
            "doc_id",
            _md5_bucket().alias("bucket"),
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(0, size(w) - 4),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3])))"
                )
            ).alias("ngram"),
        )
    )
    test_sh = sh.filter(F.col("bucket") >= 230).select("ngram").distinct()
    hits = (
        sh.filter(F.col("bucket") < 204)
        .join(F.broadcast(test_sh), "ngram")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = d.select("doc_id", "source", _md5_bucket().alias("bucket")).filter(
        F.col("bucket") < 204
    )
    return (
        train.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.count("hit").alias("n_contaminated"),
            (F.count("hit").cast("double") / F.count("*")).alias(
                "contamination_rate"
            ),
        )
    )


@register(
    "pii_scrub_regex",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 > 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                THEN ' call +61 400 ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text,
                '\+\d{2} \d{3} \d{3}')) AS BIGINT) AS n_phones,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+\d{2} \d{3} \d{3}', '<PHONE>', 'g') AS scrubbed
    FROM aug
    """,
    tags=("text", "redact"),
)
def pii_scrub_regex(spark, sf_dir):
    """PII scrubbing by regex (emails, phone numbers) — the masking
    pass every training corpus runs after the denylist scrub
    (redact_denylist_terms). The corpus has no real PII, so the query
    first SYNTHESIZES it deterministically per doc_id (both engines
    apply the same augmentation, so the oracle still checks the scrub,
    not the fixture). Patterns stay inside the Java-regex ∩ RE2 common
    subset so Spark and DuckDB compile them identically; the whole op
    is a codegen projection — no shuffle, embarrassingly parallel at
    any scale. DuckDB needs the 'g' flag to match Spark's replace-all
    semantics."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+\d{2} \d{3} \d{3}"
    # no fan_out: this is a pure projection — the plan must stay
    # Exchange-free (pinned in test_plan_quality), and on a real
    # cluster the scan's natural splits already parallelize it
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 > 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" call +61 400 "),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        # F.regexp_extract_all takes the pattern as a literal column —
        # no SQL-string escaping layer to corrupt the backslashes
        F.size(F.regexp_extract_all(F.col("text"), F.lit(email_re), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(phone_re), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("scrubbed"),
    )


@register(
    "group_concat_sorted",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types_csv,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY user_id
    """,
    tags=("A-string",),
)
def group_concat_sorted(spark, sf_dir):
    """Deterministic ordered string aggregation (DuckDB/Postgres
    string_agg ... ORDER BY): Spark's collect_set is order-unstable
    across partitions, so the portable form is collect_set →
    array_sort → concat_ws — same one-shuffle aggregation, with the
    ordering done per-group after the partial-merge (bounded by the
    distinct-value count, not the row count)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
                "types_csv"
            ),
            F.count("*").alias("n_types"),
        )
    )


@register(
    "char_trigram_lang_profile",
    oracle="""
    WITH tg AS (
      SELECT lang, substr(text, i, 3) AS trigram
      FROM documents, UNNEST(generate_series(1, length(text) - 2)) AS t(i)
      WHERE length(text) >= 3
    ),
    c AS (
      SELECT lang, trigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM tg GROUP BY lang, trigram
    )
    SELECT lang, trigram, n, CAST(rk AS INTEGER) AS rk FROM (
      SELECT lang, trigram, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, trigram) AS rk
      FROM c
    ) WHERE rk <= 10
    """,
    tags=("text",),
)
def char_trigram_lang_profile(spark, sf_dir):
    """Top-10 character trigrams per language — the profile table a
    real char-n-gram language identifier trains on (lang_id_heuristic's
    stopword lists are the toy stand-in; this builds the actual model
    input). Explode is linear in corpus bytes; the count aggregates
    map-side on a (lang, trigram) key whose cardinality is bounded by
    the alphabet, and the top-10 is a per-lang TakeOrdered, never a
    global sort."""
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 3
    )
    tg = d.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 2), i -> substr(text, i, 3))")
        ).alias("trigram"),
    )
    c = tg.groupBy("lang", "trigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "trigram")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang", "trigram", "n", "rk")
    )


@register(
    "asof_join_forward",
    oracle="""
    WITH fc AS (
      SELECT user_id, ts AS fc_ts, value AS fc_value
      FROM events WHERE event_id % 20 = 0
    )
    SELECT e.event_id, e.user_id, e.ts, f.fc_value
    FROM events e
    ASOF LEFT JOIN fc f ON e.user_id = f.user_id AND e.ts <= f.fc_ts
    """,
    tags=("J-asof",),
)
def asof_join_forward(spark, sf_dir):
    """Forward as-of join: each event gets the EARLIEST forecast at or
    after its timestamp, per user — the scheduling/lookahead twin of
    asof_join_backward (next price revision, next maintenance window).
    Same union-and-carry operator (operators/asof.py), direction
    flipped: one shuffle on the key, no BNLJ; DuckDB's native forward
    ASOF JOIN is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    fc = ev.filter(F.col("event_id") % 20 == 0).select(
        "user_id", F.col("ts").alias("fc_ts"), F.col("value").alias("fc_value")
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        fc,
        on=["user_id"],
        left_ts="ts",
        right_ts="fc_ts",
        value_cols=["fc_value"],
        direction="forward",
    )


@register(
    "dedup_keep_longest",
    oracle=f"""
    WITH fp AS ({_WINNOW_FP_SQL}),
    r AS (
      SELECT d.doc_id, f.winnow_fp, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY f.winnow_fp
                                ORDER BY d.n_chars DESC, d.doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY f.winnow_fp) AS BIGINT)
               AS cluster_size
      FROM documents d JOIN fp f USING (doc_id)
    )
    SELECT doc_id, n_chars, cluster_size FROM r WHERE rk = 1
    """,
    tags=("dedup", "corpus-health"),
)
def dedup_keep_longest(spark, sf_dir):
    """Quality-policy survivor selection: within each winnow-fingerprint
    near-dup cluster keep the LONGEST member (ties → min doc_id) — the
    'keep the richest copy' policy real pipelines prefer over
    dedup_keep_canonical's min-id rule (a boilerplate-stripped fragment
    should lose to the full article it duplicates). One shuffle on the
    fingerprint; both windows share it. The survivor's cluster_size is
    kept so downstream mixture weighting can discount heavily-duplicated
    content."""
    fp = _winnow_fp(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = d.join(fp.select("doc_id", "winnow_fp"), "doc_id")
    w = Window.partitionBy("winnow_fp").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    wc = Window.partitionBy("winnow_fp")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .withColumn("cluster_size", F.count("*").over(wc))
        .filter(F.col("rk") == 1)
        .select("doc_id", "n_chars", "cluster_size")
    )


@register(
    "bpe_top_merge_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT substr(w, i, 2) AS pair
      FROM words, UNNEST(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    ),
    c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair)
    SELECT pair, n, CAST(rk AS INTEGER) AS rk FROM (
      SELECT pair, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rk
      FROM c
    ) WHERE rk <= 20
    """,
    tags=("text", "tokenizer"),
)
def bpe_top_merge_pairs(spark, sf_dir):
    """The first iteration of BPE tokenizer training: count every
    adjacent symbol pair inside words across the corpus and rank the
    merge candidates (Sennrich et al., ACL'16 — the highest-count pair
    becomes the first merge rule). Explode is linear in corpus bytes;
    the count aggregates map-side on a key bounded by the symbol-pair
    alphabet, and the top-20 is a TakeOrdered over that tiny aggregate
    — at 100 TB this is one scan + one bounded shuffle, the exact shape
    production BPE trainers (which iterate this step) distribute."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"
                )
            ).alias("pair")
        )
    )
    c = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    # top-20 via TakeOrderedAndProject (per-partition heap + driver
    # merge — same pattern as vocab_top_tokens); the rank window runs
    # only over the 20 survivors
    top = c.orderBy(F.col("n").desc(), "pair").limit(20)
    w = Window.orderBy(F.col("n").desc(), "pair")
    return top.withColumn("rk", F.row_number().over(w)).select("pair", "n", "rk")


@register(
    "token_budget_cut_per_source",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, n_chars,
             CAST(SUM(n_chars) OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_chars
      FROM documents
    )
    SELECT doc_id, source, n_chars, cum_chars
    FROM scored WHERE cum_chars <= 2000
    """,
    tags=("mixture", "sampling"),
)
def token_budget_cut_per_source(spark, sf_dir):
    """Per-source corpus budgeting: rank each source's docs by a
    quality proxy (length here; production plugs in any score) and keep
    docs until the source's running token budget is exhausted — how a
    mixture spec like 'at most N tokens per domain' is actually
    materialized. One shuffle on source; the running sum is a
    per-partition cursor and the budget gate is a row-local filter, so
    at 100 TB this costs exactly one window pass. Deterministic
    tie-break (doc_id) makes the cut reproducible run to run."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select(
            "doc_id", "source", "n_chars",
            F.sum("n_chars").over(w).alias("cum_chars"),
        )
        .filter(F.col("cum_chars") <= 2000)
    )


# ------------------------------------------------- distribution drift --


def _ks_sql(vexpr: str) -> str:
    """The exact two-sample KS oracle over any integer value
    expression — `n_chars` for the raw-value query, a fixed-width
    bucket expression for the domain-bounded variant."""
    return f"""
    WITH counts AS (
      SELECT source, {vexpr} AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT {vexpr} AS v FROM documents),
    srcs AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM counts GROUP BY source
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    gcum AS (
      SELECT v, CAST(SUM(cv) OVER (ORDER BY v) AS BIGINT) AS cg
      FROM (SELECT v, SUM(c) AS cv FROM counts GROUP BY v)
    ),
    cells AS (
      SELECT s.source, g.v, s.n_s,
             CAST(SUM(COALESCE(c.c, 0))
                  OVER (PARTITION BY s.source ORDER BY g.v) AS BIGINT) AS cs
      FROM srcs s
      CROSS JOIN grid g
      LEFT JOIN counts c ON c.source = s.source AND c.v = g.v
    ),
    diffs AS (
      SELECT cells.source, cells.v, cells.n_s,
             t.n - cells.n_s AS n_rest,
             ABS(CAST(cs AS DOUBLE) / cells.n_s
                 - CAST(gc.cg - cs AS DOUBLE) / (t.n - cells.n_s)) AS diff
      FROM cells
      JOIN gcum gc ON gc.v = cells.v
      CROSS JOIN tot t
      WHERE t.n > cells.n_s  -- a sole source has no complement to drift against
    )
    SELECT source,
           CAST(n_s AS BIGINT) AS n_source,
           CAST(n_rest AS BIGINT) AS n_rest,
           diff AS ks_stat,
           CAST(v AS BIGINT) AS ks_at_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY diff DESC, v
      ) AS rn FROM diffs
    )
    WHERE rn = 1
"""


_KS_SQL = _ks_sql("n_chars")


@register("ks_drift_by_source", oracle=_KS_SQL, tags=("quality", "drift"))
def ks_drift_by_source(spark, sf_dir):
    """EXACT two-sample Kolmogorov–Smirnov drift per source: for each
    source, the KS statistic between its doc-length (n_chars)
    distribution and the rest of the corpus, plus the length where the
    CDF gap peaks.  This is the distribution-drift monitor a corpus
    pipeline runs on every new snapshot/feed — a source whose KS jumps
    changed its content shape (truncation bug, template change, new
    crawler) long before averages move.  The same plan drifts ANY
    numeric column (token counts, quality scores) by swapping the
    projection.

    Exactness: the empirical CDFs are cumulative BIGINT counts divided
    once into doubles; diff/ABS/MAX over those doubles is IEEE-
    deterministic, and the arg-max row is picked by ROW_NUMBER with a
    total tie-break (diff desc, value asc), so DuckDB replays the
    report bit-for-bit — no KS p-value approximation enters the plan.

    Scale: per-(source, value) counts partial-aggregate map-side; the
    evaluation lattice is sources × DISTINCT VALUES (bounded by the
    value domain, not row count).  The one global window (corpus CDF)
    orders the value GRID, not rows — the source of the WindowExec
    single-partition warning, and it is SAFE exactly while the grid is
    small: n_chars is integral and practically bounded, so the window
    input is the distinct-length lattice (a few thousand rows at any
    corpus size).  CAVEAT, 100 TB: on a continuous or unbounded value
    column the lattice approaches row count and this window
    centralizes — drift such columns through ks_drift_bucketed, which
    caps the grid at a fixed bucket count by construction.  No
    all-pairs source comparison: each source tests against the corpus
    complement, so adding a source adds one lattice slice."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    counts = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("c")
    )
    return _ks_from_counts(counts)


def _ks_from_counts(counts):
    """Exact two-sample KS report from a (source, v, c) counts frame —
    the shared core of ks_drift_by_source (raw integral values) and
    ks_drift_bucketed (fixed-width buckets). The window/lattice scale
    analysis lives on the two registered queries."""
    # every downstream branch derives from `counts`, so the one
    # (source, v) exchange is the shared trunk AQE can reuse: srcs and
    # gcum re-aggregate it, the value grid is gcum's key set, and the
    # corpus total folds srcs — documents is SCANNED ONCE.
    srcs = counts.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    tot = srcs.agg(F.sum("n_s").cast("long").alias("n"))
    gcum = (
        counts.groupBy("v")
        .agg(F.sum("c").alias("cv"))
        .select(
            "v",
            F.sum("cv")
            .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cg"),
        )
    )
    grid = gcum.select("v")
    cells = (
        srcs.crossJoin(grid)
        .join(counts, ["source", "v"], "left")
        .select(
            "source",
            "v",
            "n_s",
            F.sum(F.coalesce("c", F.lit(0)))
            .over(
                Window.partitionBy("source")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long")
            .alias("cs"),
        )
    )
    diffs = (
        cells.join(gcum, "v")
        .crossJoin(F.broadcast(tot))
        # a source that IS the whole corpus has no complement: its
        # 0/0 CDF would be NaN and NaN ordering differs — drop it on
        # both sides rather than hash-gamble on degenerate rows
        .filter(F.col("n") > F.col("n_s"))
        .select(
            "source",
            "v",
            "n_s",
            (F.col("n") - F.col("n_s")).alias("n_rest"),
            F.abs(
                F.col("cs").cast("double") / F.col("n_s")
                - (F.col("cg") - F.col("cs")).cast("double")
                / (F.col("n") - F.col("n_s"))
            ).alias("diff"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("diff"), "v")
    return (
        diffs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("n_s").alias("n_source"),
            F.col("n_rest").cast("long").alias("n_rest"),
            F.col("diff").alias("ks_stat"),
            F.col("v").cast("long").alias("ks_at_value"),
        )
    )


_KS_BUCKET_WIDTH = 64


@register(
    "ks_drift_bucketed",
    oracle=f"""
    SELECT source, n_source, n_rest, ks_stat,
           ks_at_value AS ks_at_bucket,
           CAST(ks_at_value * {_KS_BUCKET_WIDTH} AS BIGINT) AS bucket_lo
    FROM ({_ks_sql(f"(n_chars // {_KS_BUCKET_WIDTH})")})
    """,
    tags=("quality", "drift"),
)
def ks_drift_bucketed(spark, sf_dir):
    """Two-sample KS drift per source over FIXED-WIDTH VALUE BUCKETS —
    the domain-bounded form of ks_drift_by_source for continuous or
    unbounded columns.  The CDFs are evaluated on the bucket lattice
    (width 64 chars here — _KS_BUCKET_WIDTH), so the global cumulative
    window's input is capped at domain/width rows BY CONSTRUCTION —
    never row count — which removes the only centralization point the
    raw-value query carries at 100 TB (its grid is the distinct-value
    set, fine for integral lengths, unbounded for continuous scores).
    The statistic is the exact KS over the bucketed distributions:
    binning coarsens where inside a bucket the gap peaks (reported as
    bucket_lo, the bucket's inclusive lower bound) but every count,
    division, and tie-break is still replayed bit-for-bit by the
    oracle.  Same single-scan counts trunk, same complement test."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    counts = d.groupBy(
        "source", F.expr(f"n_chars DIV {_KS_BUCKET_WIDTH}").alias("v")
    ).agg(F.count("*").alias("c"))
    rep = _ks_from_counts(counts)
    return rep.select(
        "source",
        "n_source",
        "n_rest",
        "ks_stat",
        F.col("ks_at_value").alias("ks_at_bucket"),
        (F.col("ks_at_value") * _KS_BUCKET_WIDTH)
        .cast("long")
        .alias("bucket_lo"),
    )


@register(
    "doc_skyline_pareto",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT a.doc_id, a.n_distinct, a.n_tokens
    FROM m a
    WHERE NOT EXISTS (
      SELECT 1 FROM m b
      WHERE b.n_distinct >= a.n_distinct AND b.n_tokens <= a.n_tokens
        AND (b.n_distinct > a.n_distinct OR b.n_tokens < a.n_tokens)
    )
    """,
    tags=("quality", "scale"),
)
def doc_skyline_pareto(spark, sf_dir):
    """Skyline (Pareto front) data selection: docs not dominated on
    (maximize distinct tokens, minimize total tokens) — the
    "information-dense" frontier a curation pipeline samples from.

    The oracle is the textbook quadratic NOT EXISTS; the Spark plan is
    the 2-D sweep, fully JVM-side and NEVER all-pairs: groupBy the
    maximize-axis (distinct-count values — bounded by max doc length,
    thousands of rows at any corpus size, NOT corpus-sized), take
    min(n_tokens) per value, one running-min window over that bounded
    aggregate (strictly-larger values only: rowsBetween(unbounded,-1)
    after a desc sort — same bounded-frame pattern as the post-limit
    ranking windows), keep values where min_t < running-min (ties on
    BOTH axes survive; a strictly-larger-axis tie dominates), then
    broadcast the surviving (n_distinct, n_tokens) frontier back as an
    equi-join to recover doc_ids.  Two shuffles + one broadcast at any
    scale; dominance arithmetic is all integer, so the gate is exact."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    m = d.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_distinct"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    agg = m.groupBy("n_distinct").agg(F.min("n_tokens").alias("min_t"))
    w = Window.orderBy(F.col("n_distinct").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        agg.withColumn("run_t", F.min("min_t").over(w))
        .filter(F.col("min_t") < F.coalesce("run_t", F.lit(1 << 62)))
        .select("n_distinct", F.col("min_t").alias("n_tokens"))
    )
    return m.join(F.broadcast(frontier), ["n_distinct", "n_tokens"]).select(
        "doc_id", "n_distinct", "n_tokens"
    )


@register(
    "token_simpson_concentration",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cnt AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(c * c) AS BIGINT) AS sum_c2,
           CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS simpson
    FROM cnt GROUP BY doc_id
    """,
    tags=("text", "quality"),
)
def token_simpson_concentration(spark, sf_dir):
    """Simpson/Herfindahl token concentration per document: sum over
    token types of (count/total)^2 — the no-logarithm diversity
    statistic (1/simpson = effective vocabulary size).  Template spam
    concentrates mass on few tokens (simpson -> 1); natural text stays
    near 1/n_distinct.  Complements doc_repetition_score (bigram
    repeat fraction) with a DISTRIBUTION-shape signal.

    Chosen over Shannon entropy deliberately: entropy needs log(),
    whose last-ulp rounding differs across engines (see the unrolled
    log2 CASE note in corpus_graph.py) — Simpson is exact bigint
    sums and ONE final division of exact integers, so the value hash
    is bit-identical by construction.  Plan: explode -> two-level
    partial-aggregated groupBy, no joins, no Python."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        (
            F.sum(F.col("c") * F.col("c")).cast("double")
            / (F.sum("c").cast("double") * F.sum("c").cast("double"))
        ).alias("simpson"),
    )

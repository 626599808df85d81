"""Round-8 bonus operators: edit-distance blocked near-dup pairs
(entity-resolution verify) and the Count-Min-Sketch heavy-hitter gate.

The driver's hash gate already pins both queries end to end against
DuckDB at sf0.01; these tests pin the properties the gate can't state —
cross-engine Levenshtein parity on adversarial strings, the equi-join
(never BNLJ) blocking plan, the CMS one-sided error guarantee, and CMS
linearity (mergeability across corpus shards, the 100 TB property).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nemscraper_spark.queries import REGISTRY


# ---------------------------------------------------------------- fuzzy


LEV_CASES = [
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("abc", "abc"),
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("ab", "ba"),  # transposition costs 2 under unit-cost Levenshtein
    ("aaaa", "aa"),
    ("abcdefghij", "jihgfedcba"),
    ("scan table merge", "scan table merge"),
    ("scan table merge", "scan merge table"),
    ("x" * 40, "x" * 39 + "y"),
]


def test_levenshtein_cross_engine_parity(spark):
    """Spark's F.levenshtein and DuckDB's levenshtein must agree on
    every candidate pair or the fuzzy hash gate is meaningless —
    pinned on transpositions, deletions, reversals, and boundary
    (empty) strings."""
    rows = [(a, b) for a, b in LEV_CASES]
    got = {
        (r.a, r.b): r.d
        for r in spark.createDataFrame(rows, "a string, b string")
        .select("a", "b", F.levenshtein("a", "b").alias("d"))
        .collect()
    }
    con = duckdb.connect()
    for a, b in LEV_CASES:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


# Outside ASCII the engines genuinely DISAGREE: Spark's levenshtein
# counts CODEPOINT edits, DuckDB's counts UTF-8 BYTE edits. Pinned as
# (a, b, codepoint_dist, byte_dist) so a silent semantics change in
# either engine (or an accidental use of the fuzzy gate on a non-ASCII
# corpus) fails loudly instead of shifting hashes. The two coincide
# exactly when every edit touches one single-byte character — which
# includes equal-length multibyte substitutions confined to one byte
# (日本語/日本誤) but NOT Latin-1 accents (café/cafe: é is 2 bytes).
MULTIBYTE_LEV_CASES = [
    ("café", "cafe", 1, 2),
    ("über", "uber", 1, 2),
    ("naïve", "naive", 1, 2),
    ("日本語", "日本誤", 1, 1),  # same final byte edited: engines agree
    ("αβγ", "αβδ", 1, 1),
    ("é", "é", 2, 3),  # combining accent: neither normalizes
]


def test_levenshtein_multibyte_semantics_pinned(spark, sf_dir_oracle):
    """Codepoint-vs-byte semantics pinned per engine, plus the corpus
    precondition that makes fuzzy_levenshtein_pairs' cross-engine hash
    gate sound anyway: every compared prefix in the oracle corpus is
    pure ASCII, where the two semantics coincide."""
    rows = [(a, b) for a, b, _, _ in MULTIBYTE_LEV_CASES]
    got = {
        (r.a, r.b): r.d
        for r in spark.createDataFrame(rows, "a string, b string")
        .select("a", "b", F.levenshtein("a", "b").alias("d"))
        .collect()
    }
    con = duckdb.connect()
    for a, b, cp_dist, byte_dist in MULTIBYTE_LEV_CASES:
        assert got[(a, b)] == cp_dist, ("spark", a, b, got[(a, b)], cp_dist)
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert want == byte_dist, ("duckdb", a, b, want, byte_dist)

    non_ascii = con.execute(
        "SELECT COUNT(*) FROM "
        f"'{sf_dir_oracle}/documents.parquet' "
        "WHERE substr(text, 1, 40) ~ '[^\\x00-\\x7F]'"
    ).fetchone()[0]
    assert non_ascii == 0


def test_fuzzy_pairs_exact_and_fuzzy_present(spark, sf_dir_oracle):
    """The sf0.01 corpus must yield BOTH kinds of survivors: dist == 0
    (exact-prefix dup pairs) and 0 < dist <= 20 (the fuzzy tier the
    shingle family can't rank) — otherwise the threshold stops
    exercising the edit-distance path.  Pairs are canonical (a < b)."""
    out = REGISTRY["fuzzy_levenshtein_pairs"].fn(spark, sf_dir_oracle).collect()
    assert len(out) > 0
    dists = [r.dist for r in out]
    assert min(dists) == 0
    assert any(0 < d <= 20 for d in dists)
    assert all(r.doc_id_a < r.doc_id_b for r in out)


def test_fuzzy_pairs_plan_is_blocked_equijoin(spark, sf_dir_oracle):
    """Candidates must come from an EQUI-join on the blocking key —
    a BroadcastNestedLoopJoin / CartesianProduct here is the all-pairs
    plan the blocking exists to avoid."""
    plan = (
        REGISTRY["fuzzy_levenshtein_pairs"]
        .fn(spark, sf_dir_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ cms


def test_cms_estimate_never_undercounts(spark, sf_dir_oracle):
    """The CMS point estimate is one-sided: min over d cells can only
    OVERcount (collisions add, never subtract)."""
    out = REGISTRY["cms_heavy_hitters"].fn(spark, sf_dir_oracle).collect()
    assert len(out) == 10
    for r in out:
        assert r.cms_est >= r.exact_cnt
        assert r.overcount == r.cms_est - r.exact_cnt


def test_cms_counters_merge_linearly(spark, sf_dir_oracle):
    """CMS linearity — the 100 TB property: counters built per corpus
    shard and summed CELL-WISE must equal the whole-corpus counters
    (how production merges per-(shard, window) matrices upward without
    ever re-reading tokens)."""
    from nemscraper_spark.queries.common import load_table
    from nemscraper_spark.queries.extended_ops import _cms_counters

    d = load_table(spark, sf_dir_oracle, "documents")

    def counters(df):
        tc = (
            df.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
        )
        cms, _ = _cms_counters(tc)
        return cms

    whole = {
        (r.rw, r.bucket): r.total
        for r in counters(d).collect()
    }
    halves = (
        counters(d.filter(F.col("doc_id") % 2 == 0))
        .unionByName(counters(d.filter(F.col("doc_id") % 2 == 1)))
        .groupBy("rw", "bucket")
        .agg(F.sum("total").alias("total"))
    )
    merged = {(r.rw, r.bucket): r.total for r in halves.collect()}
    assert merged == whole


def test_cms_visible_collision_at_sf001(spark, sf_dir_oracle):
    """At sf0.01 at least one top-10 token must collide (overcount > 0)
    and at least one must not — the sketch is behaving like a sketch,
    not degenerating into either an exact counter or pure noise."""
    out = REGISTRY["cms_heavy_hitters"].fn(spark, sf_dir_oracle).collect()
    assert any(r.overcount > 0 for r in out)
    assert any(r.overcount == 0 for r in out)


# ------------------------------------------------------------------ kmv


def _kmv_h(spark, sf_dir):
    from nemscraper_spark.queries.common import load_table

    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderstatus").alias("st"),
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12).alias(
            "hx"
        ),
    ).distinct()


def test_kmv_prefilter_equivalence(spark, sf_dir_oracle):
    """The 100 TB build path: prefilter hx < t BEFORE the partitioned
    sort.  Whenever every set keeps >= k survivors, the prefiltered
    sketch must be IDENTICAL to the full-sort sketch (the k smallest
    of a set are unchanged by dropping elements above a threshold that
    retains at least k)."""
    from nemscraper_spark.queries.extended_ops import _KMV_K, _kmv_sketch

    h = _kmv_h(spark, sf_dir_oracle)
    pre = h.filter(F.col("hx") < "4")  # keeps ~1/4 of the hash space
    survivors = {
        r.st: r.n
        for r in pre.groupBy("st").agg(F.count("*").alias("n")).collect()
    }
    assert all(n >= _KMV_K for n in survivors.values()), survivors
    full = {(r.st, r.hx) for r in _kmv_sketch(h, "st").collect()}
    fast = {(r.st, r.hx) for r in _kmv_sketch(pre, "st").collect()}
    assert fast == full


def test_kmv_estimates_track_exact(spark, sf_dir_oracle):
    """k=128 => ~8.8% expected relative error; pin a generous 35%
    envelope on every per-set and intersection estimate so a broken
    estimator (wrong scale constant, off-by-one k) can't hide."""
    from nemscraper_spark.queries import REGISTRY

    out = REGISTRY["kmv_audience_overlap"].fn(spark, sf_dir_oracle).collect()
    assert len(out) == 3  # status pairs F/O/P choose 2
    exact = {
        r.st: r.n
        for r in _kmv_h(spark, sf_dir_oracle)
        .groupBy("st")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in out:
        assert abs(r.est_a - exact[r.st_a]) / exact[r.st_a] < 0.35
        assert abs(r.est_b - exact[r.st_b]) / exact[r.st_b] < 0.35
        assert r.exact_intersection > 0
        assert (
            abs(r.est_intersection - r.exact_intersection)
            / r.exact_intersection
            < 0.35
        )


def test_kmv_exact_mode_below_k(spark, tmp_path):
    """Sets retaining fewer than k hashes must report their EXACT
    retained count (DataSketches theta 'exact mode') — pinned on a
    synthetic orders table whose per-status sets (40/60 customers,
    overlap 20) sit far below k=128: every estimate must be EXACT, not
    an extrapolation off a non-saturated sketch."""
    from nemscraper_spark.queries import REGISTRY

    rows = [(c, "A") for c in range(40)] + [
        (c, "B") for c in range(20, 80)
    ]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = REGISTRY["kmv_audience_overlap"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.st_a, r.st_b) == ("A", "B")
    assert r.est_a == 40.0
    assert r.est_b == 60.0
    assert r.est_union == 80.0
    assert r.exact_intersection == 20
    assert r.est_intersection == pytest.approx(20.0)


def test_kmv_disjoint_pairs_report_zero(spark, tmp_path):
    """A status pair with NO shared customers must still appear in the
    report, with n_common / est_intersection / exact_intersection all
    0 — the round-8 inner joins silently dropped disjoint pairs
    (round-8 ADVICE). Three statuses: A∩B = 20, A∩C = B∩C = ∅."""
    from nemscraper_spark.queries import REGISTRY

    rows = (
        [(c, "A") for c in range(40)]
        + [(c, "B") for c in range(20, 80)]
        + [(c, "C") for c in range(1000, 1030)]
    )
    spark.createDataFrame(
        rows, "o_custkey long, o_orderstatus string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        (r.st_a, r.st_b): r
        for r in REGISTRY["kmv_audience_overlap"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    for pair in (("A", "C"), ("B", "C")):
        r = out[pair]
        assert r.n_common == 0
        assert r.est_intersection == 0.0
        assert r.exact_intersection == 0
    assert out[("A", "B")].exact_intersection == 20


def test_kmv_union_sketch_is_mergeable(spark, sf_dir_oracle):
    """KMV mergeability — the scale property: the pairwise union sketch
    built from the two k-row SKETCHES must equal the sketch built from
    the raw union of the underlying sets (k smallest of a union = k
    smallest of the union of each side's k smallest)."""
    from nemscraper_spark.queries.extended_ops import _KMV_K, _kmv_sketch

    h = _kmv_h(spark, sf_dir_oracle)
    kmv = _kmv_sketch(h, "st")
    sts = sorted(r.st for r in h.select("st").distinct().collect())
    for i, a in enumerate(sts):
        for b in sts[i + 1 :]:
            from_sketches = sorted(
                r.hx
                for r in _kmv_sketch(
                    kmv.filter(F.col("st").isin(a, b))
                    .select(F.lit("u").alias("st"), "hx")
                    .distinct(),
                    "st",
                ).collect()
            )
            from_raw = sorted(
                r.hx
                for r in _kmv_sketch(
                    h.filter(F.col("st").isin(a, b))
                    .select(F.lit("u").alias("st"), "hx")
                    .distinct(),
                    "st",
                ).collect()
            )
            assert from_sketches == from_raw
            assert len(from_raw) == _KMV_K


# ------------------------------------------------- streaming full outer


def test_streaming_full_outer_emits_all_three_row_classes(
    spark, sf_dir_oracle
):
    """FULL OUTER must emit matched, left-only (NULL forecast), and
    right-only (NULL event) rows, with every sentinel filtered out —
    the three-class coverage that distinguishes it from the left-outer
    entry."""
    out = (
        REGISTRY["streaming_interval_join_full"]
        .fn(spark, sf_dir_oracle)
        .collect()
    )
    matched = [r for r in out if r.event_id is not None and r.fc_user is not None]
    left_only = [r for r in out if r.fc_user is None]
    right_only = [r for r in out if r.event_id is None]
    assert matched and left_only and right_only
    assert len(matched) + len(left_only) + len(right_only) == len(out)
    assert all((r.user_id is None or r.user_id >= 0) for r in out)
    assert all((r.fc_user is None or r.fc_user >= 0) for r in out)


# ------------------------------------------------------------------ rrf


def test_rrf_fuses_two_genuinely_different_rankers(spark, sf_dir_oracle):
    """Cosine and sign-Hamming rankings must actually DISAGREE
    somewhere (else the fusion degenerates — raw dot did, on this
    near-unit-norm corpus), every fused score must equal the
    recomputed 1/(60+rank) sum, and double-listed docs dominate: any
    doc in BOTH top-20s scores above the 1/61 ceiling of a doc in only
    one."""
    out = REGISTRY["rank_fusion_rrf"].fn(spark, sf_dir_oracle).collect()
    assert len(out) == 50  # 10 queries x fused top-5
    assert any(
        r.rank_cos is not None
        and r.rank_ham is not None
        and r.rank_cos != r.rank_ham
        for r in out
    )
    both = [r for r in out if r.rank_cos is not None and r.rank_ham is not None]
    assert both
    for r in out:
        want = (1.0 / (60 + r.rank_cos) if r.rank_cos is not None else 0.0) + (
            1.0 / (60 + r.rank_ham) if r.rank_ham is not None else 0.0
        )
        assert r.rrf_score == pytest.approx(want, abs=1e-9)
    worst_both = min(
        1.0 / (60 + r.rank_cos) + 1.0 / (60 + r.rank_ham) for r in both
    )
    # >= not >: a doc ranked exactly 20 by BOTH rankers scores exactly
    # 2/80 — a legitimate outcome on a regenerated corpus. The stated
    # invariant is only that any double-listed score beats the 1/61
    # single-list ceiling.
    assert worst_both >= 2.0 / 80.0 > 1.0 / 61.0


# ------------------------------------------------------------------- dq


def test_dq_report_exercises_both_verdicts(spark, sf_dir_oracle):
    """The expectations suite must flow BOTH branches: the per-user
    volume guard genuinely fails on this corpus, everything else
    passes with measured == 0 violations; pass is derived from the
    measured value, never stored independently."""
    out = {
        r.constraint_name: r
        for r in REGISTRY["dq_expectations_report"]
        .fn(spark, sf_dir_oracle)
        .collect()
    }
    assert len(out) == 8
    failing = [n for n, r in out.items() if not r["pass"]]
    passing = [n for n, r in out.items() if r["pass"]]
    assert failing == ["volume_events_per_user_max"]
    assert len(passing) == 7
    for r in out.values():
        assert r["pass"] == (r.measured <= r.threshold)


# ------------------------------------------------------------ plan pins


def test_cms_topk_plan_is_take_ordered(spark, sf_dir_oracle):
    """The heavy-hitter probe side must plan as TakeOrderedAndProject
    (top-k over the survivor set), never a global sort."""
    plan = (
        REGISTRY["cms_heavy_hitters"]
        .fn(spark, sf_dir_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dq_referential_checks_broadcast(spark, sf_dir_oracle):
    """The RI anti-joins must broadcast the dim-key side — a
    shuffled anti-join on the fact table is the plan that dies first
    at 100 TB — and nothing in the suite may fall back to a nested
    loop."""
    plan = (
        REGISTRY["dq_expectations_report"]
        .fn(spark, sf_dir_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

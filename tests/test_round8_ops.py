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

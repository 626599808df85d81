"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship FPP performance pipeline on sf0.001
queries()      — every implemented operator from SURVEY.md §2 (+ the
                 training-data ops), one callable per name
oracle_sql()   — DuckDB-dialect equivalents (recursive EWMA included,
                 via a bit-exact recursive CTE); keys without an oracle
                 are the genuinely non-deterministic-SQL ops
                 (hash-seeded MinHash/LSH, approximate ANN/sketches,
                 file-integration round trips) and get the driver's
                 rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from nemscraper_spark.queries import REGISTRY  # noqa: E402

# Names with a cumulative hash-green driver CORRECTNESS row across
# rounds 1-2 (CORRECTNESS_r01.json 50/50 + CORRECTNESS_r02.json 48
# green; the two r02 `no_oracle` ETL rows are NOT in this set — they
# gained a real DuckDB oracle this round and re-queue first). The
# driver verifies the first ~50 entries of the queries() dict in
# iteration order, so round 3 puts the not-yet-hash-green queries
# FIRST — the re-oracled ETL round trips, then every other
# oracle-bearing unchecked query (streaming, CDC, late round-2
# additions, new round-3 queries), then the rows-only set — and the
# already-green 98 after them. Nothing is removed: if the driver
# checks more than 50, every query still gets a row.
_DRIVER_GREEN = frozenset(
    {
        # round 1 (50)
        "select_alias", "filter_eq", "filter_in", "filter_time_range",
        "project_arithmetic", "case_when", "coalesce_fill", "cast_types",
        "string_clean", "str_to_double_roundtrip", "date_from_filename",
        "ratio_division", "join_left_single", "join_inner_composite",
        "join_expr_prev_next", "join_cross_spine", "join_range_intervals",
        "join_dim_cascade", "anti_join_history", "semi_join_exists",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q1_pricing_summary", "global_agg", "count_per_key",
        "avg_by_time_bucket", "filtered_agg_pivot", "dedup_keep_first",
        "distinct_projection", "topk_orders", "sort_multi",
        "union_by_name", "union_all_stacked", "union_distinct_timeline",
        "time_bucket_sums", "interval_arithmetic", "epoch_extract",
        "linear_interpolation", "running_window_sum", "lead_lag_neighbors",
        "sessionize", "ewma_per_entity", "funnel_stages",
        "exact_quantiles_by_type", "fpp_reference_trajectory",
        "fpp_unit_deviations", "fpp_performance", "fpp_interval_charge",
        "fpp_frequency_measure_ewma", "dedup_exact",
        # round 2 (48)
        "mad_by_type", "covar_value_props", "range_frame_rolling_sum",
        "locf_forward_fill", "fpp_actual_performance",
        "ngram_jaccard_pairs", "minhash_signatures_md5",
        "minhash_lsh_pairs_md5", "simhash_fingerprint",
        "cosine_topk_bruteforce", "text_quality_score",
        "lang_id_heuristic", "token_count_regex", "doc_chunk_windows",
        "doc_winnow_fingerprint", "multimodal_decode_stub",
        "dedup_embedding_cosine", "multimodal_image_resize",
        "multimodal_frame_sample", "training_corpus_pipeline",
        "embedding_quantize_int8", "quality_filter_gopher",
        "dedup_rate_by_source", "minhash_jaccard_estimate",
        "sql_dashboard_totals", "asof_join_backward", "skew_salted_agg",
        "rollup_totals", "grouping_sets_matrix", "unpivot_metrics",
        "pivot_status_by_flag", "join_range_bucketed",
        "dashboard_state_timeline", "skew_salted_join",
        "dedup_cluster_components", "train_test_split_hash",
        "vocab_top_tokens", "tfidf_top_terms",
        "decontaminate_train_ngrams", "decontaminate_train_bloom",
        "sequence_packing", "doc_repetition_score", "sample_uniform_hash",
        "sample_stratified_topn", "redact_denylist_terms",
        "mixture_resample_weighted", "mixture_upsample_epochs",
        "dup_passage_spans",
    }
)

# Highest-priority unchecked queries: the reference's core ETL
# semantics, newly backed by a real DuckDB oracle (D-line recount over
# the staged fixture), replace their round-2 `no_oracle` rows first.
_PRIORITY_FIRST = ("nem_ingest_conservation", "nem_compaction_roundtrip")


def _green_names() -> frozenset[str]:
    """The hardcoded green set, unioned with every hash-green row found
    in CORRECTNESS_r*.json on disk — so when the driver writes this
    round's results, the NEXT round's ordering adapts without an edit
    (new greens move to the back, remaining stragglers queue first)."""
    import glob
    import json

    green = set(_DRIVER_GREEN)
    for path in glob.glob(str(Path(_REPO) / "CORRECTNESS_r*.json")):
        try:
            rows = json.loads(Path(path).read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(name)
    return frozenset(green)


# Queries added AFTER the round-3 driver window was already full: they
# sort behind even the rows-only unchecked set so they don't displace
# any query that has been waiting longer for its CORRECTNESS row.
_LATE_ADDITIONS = (
    "hopping_window_counts",
    "events_heatmap_panel",
    "retention_cohorts",
    "attribution_last_touch",
    "conversion_latency",
)


def _driver_order() -> list[str]:
    green = _green_names()
    rest = [
        n for n in REGISTRY if n not in green and n not in _PRIORITY_FIRST
    ]
    # Oracle-bearing unchecked queries first (hash gate = full signal),
    # rows-only entries after them, late additions last among the
    # unchecked; registry order within each class.
    oracle_first = sorted(
        rest,
        key=lambda n: (n in _LATE_ADDITIONS, REGISTRY[n].oracle is None),
    )
    checked = [
        n for n in REGISTRY if n in green and n not in _PRIORITY_FIRST
    ]
    pri = [n for n in _PRIORITY_FIRST if n not in green]
    pri_green = [n for n in _PRIORITY_FIRST if n in green]
    return [*pri, *oracle_first, *checked, *pri_green]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full FPP performance pipeline (SURVEY.md §3.2
    steps 2-5 — spine ⨯ units → prev/next forecast join → linear
    interpolation → deviations → p_lower/p_raise) on sf0.001."""
    from nemscraper_spark.queries.fpp_pipeline import performance

    return performance(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order()
        if REGISTRY[name].oracle is not None
    }

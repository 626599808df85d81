#!/usr/bin/env python
"""Engine benchmark: run the full queries() suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line:

    {"metric": "suite_wall_clock", "value": <sum of per-query medians>,
     "unit": "sec", "sf": <sf>, "repeats": N, "warmed": true,
     "warm_sec": <warm cost>, "queries": {<headline query>: sec, ...},
     "queries_all_file": "bench_full.json"}

The line is deliberately short (<1 KB): round 1's single 3 KB line was
truncated by the harness and recorded as unparseable. The complete
per-query medians and every repeat's raw timings go to
``bench_full.json`` next to this script.

Each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3) and
reports the per-query MEDIAN, so a single CPU-steal burst (BASELINE.md
documents ~60 s near-total steal windows on this box) cannot turn a
0.3 s projection into a 42 s outlier. Repeats stop early if the suite
exceeds $SPARK_GRAFT_BENCH_BUDGET_SEC (default 360) so the harness
never times out — but never before TWO repeats exist (round 3's 419 s
artifact was one steal-poisoned repeat recorded as the suite), queries
whose two samples disagree >2.5x get a tie-breaking third sample; the
JSON carries the /proc/stat steal delta so a noisy run self-identifies.

Each query is forced through the `noop` sink so the whole physical plan
executes (a bare .count() would let Catalyst prune the projections we
are trying to measure) without paying driver-side collection.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "fpp_performance",
    "fpp_interval_charge",
    "ewma_per_entity",
    "minhash_lsh_pairs",
    "dedup_groups_lsh",
    "ann_pq_adc",
    "nem_ingest_conservation",
    "nem_compaction_roundtrip",
    "training_corpus_pipeline",
    "simhash_near_dup_pairs",
    "sql_latest_rownum_panel",
    "ann_pq_adc_md5",
    "semantic_dedup_clusters",
    "pagerank_event_graph",
    "q21_blame_single_supplier",
    "dedup_incremental_delta",
    "lsh_band_curve_report",
    "semantic_dedup_keep_list",
    # round-5 continuation surfaces
    "streaming_interval_join_outer",
    "nem_datasource_stream",
    "ks_drift_by_source",
    "dup_graph_core_peel",
    "variant_shred_props",
    # round-5 late-batch surfaces (exact-pruning join, recursive SQL,
    # reaggregable distinct, stream-static enrichment)
    "jaccard_ppjoin_report",
    "recursive_cte_hierarchy",
    "bitmap_exact_distinct_daily",
    "streaming_static_enrich",
)


def _warm(spark, sf_dir: str) -> float:
    """One-time costs that would otherwise land inside whichever query
    happens to run first: python-worker forks, binaryFile/from_csv
    class loading, the partitioned-parquet committer, per-table file
    listing + footer reads, and the shared documents tokenize/explode
    shape (~15 corpus queries reuse it). Disclosed in the output as
    warm_sec; set SPARK_GRAFT_BENCH_COLD=1 to skip and measure a cold
    engine."""
    import tempfile

    from pyspark.sql import functions as F

    from nemscraper_spark.queries.common import TABLES, load_table

    t0 = time.perf_counter()
    spark.range(1).count()

    def _noop(batches):
        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(
        _noop, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    with tempfile.TemporaryDirectory(prefix="bench_warm_") as wtmp:
        fp = os.path.join(wtmp, "w.csv")
        with open(fp, "w") as fh:
            fh.write("a,b\n")
        spark.read.format("binaryFile").load(wtmp).select(
            F.from_csv(F.lit("a,b"), "x STRING, y STRING")
        ).count()
        spark.range(2).withColumn("date", F.lit("d")).write.mode(
            "overwrite"
        ).partitionBy("date").parquet(os.path.join(wtmp, "pq"))

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).schema
        except Exception:
            pass

    try:
        (
            load_table(spark, sf_dir, "documents")
            .withColumn("w", F.split("text", " "))
            .filter(F.size("w") >= 4)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(w) - 4),"
                        " i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3]))"
                    )
                ).alias("g")
            )
            .select(F.xxhash64("g").alias("h"))
            .groupBy("h")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    except Exception:
        pass
    return round(time.perf_counter() - t0, 3)


def _steal_sec() -> float | None:
    """Aggregate CPU-steal seconds from /proc/stat (field 8 of the
    'cpu' summary line).  Sampled before/after the suite so a poisoned
    run is self-describing: round 3's recorded 419 s (real: 135 s) ran
    inside one of the sustained near-total steal windows BASELINE.md
    documents, and nothing in the JSON said so."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # Worst-case wall clock ~= budget + one full repeat of the current
    # suite (the budget check runs between repeats, so the last repeat
    # started under budget always finishes); a quiet box finishes two
    # repeats under the check and still gets all 3 for the median.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "360"))
    cold = os.environ.get("SPARK_GRAFT_BENCH_COLD", "") == "1"

    from nemscraper_spark.queries import REGISTRY
    from nemscraper_spark.session import get_spark

    spark = get_spark(app_name="nemscraper_spark_bench")
    warm_sec = 0.0 if cold else _warm(spark, sf_dir)

    def _time_query(spec) -> float:
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    steal0 = _steal_sec()
    runs: list[dict[str, float]] = []
    t_start = time.perf_counter()
    for _ in range(max(2, repeats)):
        timings: dict[str, float] = {}
        for name, spec in sorted(REGISTRY.items()):
            timings[name] = _time_query(spec)
        runs.append(timings)
        # Never honor the budget before 2 repeats exist: round 3's
        # 419 s artifact happened exactly because a steal window pushed
        # repeat 1 past budget, collapsing the median machinery onto
        # the one poisoned sample.
        if len(runs) >= 2 and time.perf_counter() - t_start > budget:
            break

    # Outlier resolution when the budget cut us to 2 samples: a >2.5x
    # spread between the two can't be adjudicated by their mean (the
    # median of 2), so re-time just those queries once more and let a
    # true 3-sample median pick the stable pair.  The sparse retime is
    # NOT a full repeat: `repeats` reports only full passes and the
    # retimed names ship separately.  The pass gets its OWN small
    # budget measured from when it starts (an absolute deadline keyed
    # to suite start can already be in the past once two repeats run
    # long — a 200-query closing run skipped all 15 disputes that way)
    # and takes the WORST disagreements first, so the bounded time
    # fixes the medians it matters most to fix.  Worst-case wall is
    # budget + one repeat + this pass, all disclosed.
    full_repeats = len(runs)
    retimed_names: list[str] = []
    retime_skipped: list[str] = []
    if len(runs) == 2:

        def _spread(name: str) -> float:
            a, b = runs[0][name], runs[1][name]
            return max(a, b) / max(min(a, b), 0.05)

        # 2.5x, not 5x: a 2-sample median is the MEAN, so even a 3x
        # outlier (a 17s GC/steal burst against a 6s true cost) shifts
        # the recorded median by half the gap — cheap to adjudicate,
        # expensive to leave wrong.  Still worst-first, still capped.
        disputed = sorted(
            (n for n in runs[0] if _spread(n) > 2.5), key=_spread, reverse=True
        )
        retime_budget = min(60.0, 0.2 * budget)
        t_retime = time.perf_counter()
        retimed: dict[str, float] = {}
        for name in disputed:
            if time.perf_counter() - t_retime > retime_budget:
                retime_skipped.append(name)
                continue
            retimed[name] = _time_query(REGISTRY[name])
            retimed_names.append(name)
        if retimed:
            runs.append(retimed)  # sparse: only the disputed queries

    steal1 = _steal_sec()
    steal_delta = (
        round(steal1 - steal0, 1)
        if steal0 is not None and steal1 is not None
        else None
    )

    medians = {
        name: round(
            statistics.median(r[name] for r in runs if name in r), 3
        )
        for name in runs[0]
    }
    total = round(sum(medians.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    full = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "repeats": full_repeats,
        "retimed": retimed_names,
        "retime_skipped": retime_skipped,
        "warmed": not cold,
        "warm_sec": warm_sec,
        "steal_sec": steal_delta,
        "queries": medians,
        "runs": runs,
    }
    full_path = _REPO / "bench_full.json"
    full_path.write_text(json.dumps(full, indent=1))

    compact = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "repeats": full_repeats,
        "retimed_n": len(retimed_names),
        "retime_skipped_n": len(retime_skipped),
        "warmed": not cold,
        "warm_sec": warm_sec,
        "steal_sec": steal_delta,
        "queries": {k: medians[k] for k in HEADLINE if k in medians},
        "queries_all_file": "bench_full.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()

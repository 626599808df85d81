#!/usr/bin/env python
"""End-to-end operational runner — the engine's equivalent of running
the reference's three processes (nemscraper + compactor + crunch,
docker-compose.yaml:2-85) as one Spark driver program:

    poll feeds → download unseen ZIPs (ledger-deduped)
      → NEM-CSV split/typed ingest (+ conservation check)
      → per-partition compaction under the evolved schema
      → FPP analytics outputs (01/03/04-style parquet)

One --once pass is the testable unit (tests/test_pipeline_script.py
drives it on the in-repo fixture ZIP); --loop N repeats with the
reference's poll cadence (urls.rs:176-184). Feeds are any URLs
``fetch.parse_feed_links`` can read — file:// directory listings work,
which is what the smoke test uses.

Usage:
  python scripts/run_pipeline.py --workdir /tmp/nem --feed file:///...listing.html --once
  python scripts/run_pipeline.py --workdir /tmp/nem --landing-only --once
      (skip polling; process whatever ZIPs are already in
       <workdir>/zips — the daily re-enqueue sweep shape, main.rs:286-307)
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def run_once(spark, workdir: str, feeds: list[str], sf_dir: str | None) -> dict:
    """One tick: returns a summary dict of what moved."""
    from nemscraper_spark.plans.compact import compact_table
    from nemscraper_spark.plans.history import TableHistory
    from nemscraper_spark.sources import fetch
    from nemscraper_spark.sources.nemcsv import ingest

    zips_dir = os.path.join(workdir, "zips")
    parquet_dir = os.path.join(workdir, "parquet")
    history_root = os.path.join(workdir, "history")
    output_dir = os.path.join(workdir, "output")
    for d in (zips_dir, parquet_dir, history_root, output_dir):
        os.makedirs(d, exist_ok=True)

    downloaded = TableHistory(spark, history_root, "downloaded")
    processed = TableHistory(spark, history_root, "processed")

    summary: dict = {"downloaded": 0, "processed": 0, "tables": {}, "compacted": {}}

    # 1. poll + download, deduped against the ledger (main.rs:147-197)
    if feeds:
        seen = {r.filename for r in downloaded.read().collect()} if feeds else set()
        rows = fetch.poll_feeds_once(
            feeds, zips_dir, already_downloaded=lambda n: n in seen
        )
        if rows:
            downloaded.add(rows)
        summary["downloaded"] = len(rows)

    # 2. ingest every ZIP the processed ledger hasn't seen (main.rs:248-275)
    all_zips = sorted(glob.glob(os.path.join(zips_dir, "*.zip")))
    done = {r.filename for r in processed.read().collect()}
    todo = [z for z in all_zips if os.path.basename(z) not in done]
    if todo:
        counts = ingest(spark, todo, parquet_dir)
        processed.add(
            [
                {"filename": os.path.basename(z), "url": "", "size_bytes": os.path.getsize(z)}
                for z in todo
            ]
        )
        summary["processed"] = len(todo)
        summary["tables"] = counts

    # 3. compact each table's multi-file partitions (compactor.rs:584-792)
    for troot in sorted(glob.glob(os.path.join(parquet_dir, "*"))):
        if os.path.isdir(troot):
            res = compact_table(spark, troot)
            if res:
                summary["compacted"][os.path.basename(troot)] = res

    # 4. analytics outputs (crunch.rs:39-82's 01..05 parquet), snappy
    #    like the reference's hot outputs (crunch.rs:163-166)
    if sf_dir:
        from nemscraper_spark.queries.fpp_pipeline import (
            performance,
            reference_trajectory,
            unit_deviations,
        )

        for name, df in (
            ("02_reference_trajectory", reference_trajectory(spark, sf_dir)),
            ("03_unit_deviations", unit_deviations(spark, sf_dir)),
            ("04_performance", performance(spark, sf_dir)),
        ):
            df.write.mode("overwrite").option("compression", "snappy").parquet(
                os.path.join(output_dir, f"{name}.parquet")
            )
        summary["outputs"] = 3

    downloaded.vacuum()
    processed.vacuum()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--feed", action="append", default=[], help="feed URL (repeatable)")
    ap.add_argument("--landing-only", action="store_true", help="skip polling")
    ap.add_argument("--sf-dir", default=None, help="run FPP outputs over this table dir")
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--loop", type=int, default=0, help="N extra ticks, 60s apart")
    args = ap.parse_args()

    from nemscraper_spark.session import get_spark

    spark = get_spark(app_name="nem_pipeline")
    feeds = [] if args.landing_only else args.feed
    print(run_once(spark, args.workdir, feeds, args.sf_dir), flush=True)
    for _ in range(args.loop):
        time.sleep(60)  # urls.rs:176-184 poll cadence
        print(run_once(spark, args.workdir, feeds, args.sf_dir), flush=True)


if __name__ == "__main__":
    main()

"""scripts/run_pipeline.py one-shot smoke: poll a file:// feed listing,
download+ingest the fixture ZIP exactly once (ledger dedup across
ticks), compact, and write the FPP outputs."""

from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from run_pipeline import run_once  # noqa: E402

from nemscraper_spark.queries.ingest_ops import _NEM_CSV as NEM_CSV  # noqa: E402


def _make_feed(tmp_path):
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    zpath = feed_dir / "PUBLIC_DISPATCHIS_20220720_0001.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("PUBLIC_DISPATCHIS_202207201800.CSV", NEM_CSV)
    listing = feed_dir / "listing.html"
    listing.write_text(f'<html><a href="{zpath.name}">z</a></html>')
    return listing.as_uri()


def test_pipeline_once_and_dedup(spark, tmp_path, sf_dir):
    feed = _make_feed(tmp_path)
    work = str(tmp_path / "work")

    s1 = run_once(spark, work, [feed], sf_dir)
    assert s1["downloaded"] == 1
    assert s1["processed"] == 1
    assert s1["tables"]["FPP---UNIT_MW---1"] == 3
    assert s1["outputs"] == 3
    out = os.path.join(work, "output", "04_performance.parquet")
    assert spark.read.parquet(out).count() > 0

    # second tick: ledgers suppress re-download and re-processing
    s2 = run_once(spark, work, [feed], None)
    assert s2["downloaded"] == 0
    assert s2["processed"] == 0

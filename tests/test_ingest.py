"""NEM-CSV ingest path: splitter grammar, type inference, conservation
invariant, schema evolution, compaction, history ledgers.

Fixture mirrors FIXTURES.md §A (and the reference's own E2E harness,
src/bin/test_processing.rs): ground truth = count of D lines; invariant
= D-rows == parquet rows, plus the inference edge cases the reference's
test tool checks (numeric-looking strings, quoted values).
"""

from __future__ import annotations

import glob
import os
import zipfile

import pytest

from nemscraper_spark.plans.compact import compact_partition, partitions_needing_compaction
from nemscraper_spark.plans.history import TableHistory
from nemscraper_spark.sources.nemcsv import ingest, infer_types
from nemscraper_spark.sources.evolve import evolved_schema, read_evolved

NEM_CSV = "\r\n".join(
    [
        "C,NEMP.WORLD,DISPATCHIS,AEMO,PUBLIC,2022/07/20,18:00:00,0000000367313233,,",
        "I,FPP,UNIT_MW,1,MEASUREMENT_DATETIME,FPP_UNITID,PARTICIPANTID,MEASURED_MW,SCHEDULED_MW,MW_QUALITY_FLAG,CODEISH",
        'D,FPP,UNIT_MW,1,"2025/06/01 00:00:04",ARWF1,ARWF,101.5,100.0,1,0423X',
        'D,FPP,UNIT_MW,1,"2025/06/01 00:00:08",ARWF1,ARWF,102.5,100.0,1,7',
        'D,FPP,UNIT_MW,1,"2025/06/01 00:00:12",  "BDRW1"  ,BDRW,55.25,,1,9',
        "I,FPP,REGION_FREQ_MEASURE,1,MEASUREMENT_DATETIME,REGIONID,FREQ_DEVIATION_HZ,HZ_QUALITY_FLAG",
        'D,FPP,REGION_FREQ_MEASURE,1,"2025/06/01 00:00:04",NSW1,-0.01,1',
        'D,FPP,REGION_FREQ_MEASURE,1,"2025/06/01 00:00:08",NSW1,0.02,1',
        # same I header again later in the file → same table, new batch
        "I,FPP,UNIT_MW,1,MEASUREMENT_DATETIME,FPP_UNITID,PARTICIPANTID,MEASURED_MW,SCHEDULED_MW,MW_QUALITY_FLAG,CODEISH",
        'D,FPP,UNIT_MW,1,"2025/06/01 00:05:00",ARWF1,ARWF,99.0,100.0,1,8',
        'C,"END OF REPORT",11',
    ]
)
D_ROWS_TOTAL = 6
D_ROWS_UNIT_MW = 4


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    with zipfile.ZipFile(
        d / "PUBLIC_DISPATCHIS_20220720_0000000367313233.zip", "w"
    ) as zf:
        zf.writestr("PUBLIC_DISPATCHIS_202207201800.CSV", NEM_CSV)
    return str(d)


@pytest.fixture(scope="module")
def ingested(spark, landing, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("parquet"))
    counts = ingest(spark, landing, out)
    return out, counts


def test_conservation_invariant(ingested):
    """verify.rs:56-133: Σ D-rows == Σ parquet rows, per table and total."""
    _, counts = ingested
    assert counts["FPP---UNIT_MW---1"] == D_ROWS_UNIT_MW
    assert counts["FPP---REGION_FREQ_MEASURE---1"] == 2
    assert sum(counts.values()) == D_ROWS_TOTAL


def test_table_naming_and_partition(ingested):
    """chunk.rs:77-82 table name = fields 1-3 joined '---';
    chunk.rs:258-308 date= from FILENAME (2022-07-20, not row dates)."""
    out, _ = ingested
    parts = glob.glob(os.path.join(out, "FPP---UNIT_MW---1", "date=*"))
    assert [os.path.basename(p) for p in parts] == ["date=2022-07-20"]


def test_type_inference_and_cleaning(spark, ingested):
    """chunk.rs:85-130 first-non-null inference; 21-28 clean_str;
    336-345 first 4 CSV cols dropped. CODEISH starts '0423X' (non-
    numeric first value) → stays string even though later values parse."""
    out, _ = ingested
    df = spark.read.parquet(os.path.join(out, "FPP---UNIT_MW---1"))
    types = dict(df.dtypes)
    assert types["MEASUREMENT_DATETIME"] == "timestamp"
    assert types["MEASURED_MW"] == "double"
    assert types["CODEISH"] == "string"  # single-value sampling semantics
    assert types["FPP_UNITID"] == "string"
    assert "I" not in types and "FPP" not in types  # marker cols dropped
    units = {r.FPP_UNITID for r in df.select("FPP_UNITID").collect()}
    assert "BDRW1" in units  # quotes + spaces stripped
    # empty SCHEDULED_MW cell → null, not 0
    row = df.filter(df.FPP_UNITID == "BDRW1").first()
    assert row.SCHEDULED_MW is None
    assert row.MEASURED_MW == 55.25


def test_infer_types_unit():
    plan = infer_types(
        {"a": "1.5", "b": "2025/06/01 00:00:04", "c": "x1", "d": None, "e": "7"}
    )
    assert plan == {
        "a": "double",
        "b": "timestamp",
        "c": "string",
        "d": "string",
        "e": "double",
    }


def test_evolved_schema_lattice(spark, tmp_path):
    """compactor.rs:230-256: Utf8 < Float64, Utf8 < Timestamp; union of
    fields; missing columns null-filled — the case where Spark's
    mergeSchema throws."""
    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    spark.createDataFrame(
        [("1.5", "x")], "MARGINALVALUE string, ONLY_A string"
    ).write.parquet(str(a))
    spark.createDataFrame(
        [(2.5,)], "MARGINALVALUE double"
    ).write.parquet(str(b))
    files = glob.glob(str(a / "*.parquet")) + glob.glob(str(b / "*.parquet"))

    # plain mergeSchema must fail on string-vs-double → we need the resolver
    with pytest.raises(Exception):
        spark.read.option("mergeSchema", "true").parquet(str(a), str(b)).collect()

    target = evolved_schema(files)
    assert str(target["MARGINALVALUE"]) == "double"
    df = read_evolved(spark, files)
    rows = sorted(df.collect(), key=lambda r: r.MARGINALVALUE)
    assert [r.MARGINALVALUE for r in rows] == [1.5, 2.5]
    assert rows[0].ONLY_A == "x" and rows[1].ONLY_A is None


def test_compaction(spark, ingested):
    """M4: many small files → 1 file per partition, rows preserved."""
    out, counts = ingested
    root = os.path.join(out, "FPP---UNIT_MW---1")
    part = os.path.join(root, "date=2022-07-20")
    before = spark.read.parquet(root).count()
    if len(glob.glob(os.path.join(part, "*.parquet"))) < 2:
        # force a second file so compaction has work
        spark.read.parquet(part).limit(0).write.mode("append").parquet(part)
    assert part in partitions_needing_compaction(root)
    compact_partition(spark, part)
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    assert spark.read.parquet(root).count() == before


def test_compaction_rest_codec_flag(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_REST_CODEC overrides the at-rest codec (default
    zstd): a cluster with the parquet brotli jar matches the
    reference's brotli-5 format with one env var. Pinned with snappy —
    the only alternate codec guaranteed on this classpath — by reading
    the compacted footer's column codec via pyarrow."""
    import pyarrow.parquet as pq

    part = str(tmp_path / "t" / "date=2024-01-01")
    os.makedirs(part)
    spark.range(100).selectExpr("id", "id * 2 AS v").write.mode(
        "append"
    ).parquet(part)
    spark.range(50).selectExpr("id + 100 AS id", "id AS v").write.mode(
        "append"
    ).parquet(part)
    monkeypatch.setenv("SPARK_GRAFT_REST_CODEC", "snappy")
    assert compact_partition(spark, part) == 150
    files = glob.glob(os.path.join(part, "*.parquet"))
    assert len(files) == 1
    meta = pq.ParquetFile(files[0]).metadata
    codecs = {
        meta.row_group(g).column(c).compression
        for g in range(meta.num_row_groups)
        for c in range(meta.row_group(g).num_columns)
    }
    assert codecs == {"SNAPPY"}


def test_compact_table_parallel_partitions(spark, tmp_path):
    """compact_table's thread pool (the rayon-scope shape,
    compactor.rs:76-94): many partitions compact concurrently with the
    same end state as serial — one file and conserved rows each."""
    import zipfile

    from nemscraper_spark.plans.compact import compact_table
    from nemscraper_spark.sources.nemcsv import ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    days = [f"2022072{i}" for i in range(6)]
    for day in days:
        with zipfile.ZipFile(landing / f"PUBLIC_X_{day}_0001.zip", "w") as zf:
            zf.writestr(f"PUBLIC_X_{day}.CSV", NEM_CSV.replace("20220720", day))
    out = str(tmp_path / "out")
    ingest(spark, str(landing), out)
    ingest(spark, str(landing), out)  # second append: 2 files/partition
    root = os.path.join(out, "FPP---UNIT_MW---1")
    before = spark.read.parquet(root).count()

    results = compact_table(spark, root, max_parallel=4)
    assert len(results) == len(days)
    for part in results:
        assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    assert spark.read.parquet(root).count() == before


def test_history_dedup_and_vacuum(spark, tmp_path):
    """table_history.rs:188-275 semantics: add → filter_unseen → vacuum
    → keys survive."""
    h = TableHistory(spark, str(tmp_path), "downloaded")
    from datetime import datetime

    rows = [
        {"filename": "a.zip", "url": "u", "size_bytes": 10,
         "download_start": datetime(2024, 1, 1), "download_end": datetime(2024, 1, 1), "thread": 1},
        {"filename": "b.zip", "url": "u", "size_bytes": 20,
         "download_start": datetime(2024, 1, 2), "download_end": datetime(2024, 1, 2), "thread": 2},
    ]
    h.add(rows)
    cands = spark.createDataFrame(
        [("a.zip",), ("c.zip",)], "filename string"
    )
    unseen = h.filter_unseen(cands)
    assert [r.filename for r in unseen.collect()] == ["c.zip"]
    # second add = the restart-and-rescan path
    h.add([dict(rows[0], filename="d.zip")])
    h.vacuum()
    for part in glob.glob(os.path.join(str(tmp_path), "downloaded", "date=*")):
        assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    keys = {r.filename for r in h.read().collect()}
    assert keys == {"a.zip", "b.zip", "d.zip"}


@pytest.fixture()
def multi_file_partition(spark, tmp_path):
    """A standalone date= partition with 3 small files (known rows)."""
    root = str(tmp_path / "TBL")
    part = os.path.join(root, "date=2022-07-20")
    for i in range(3):
        spark.createDataFrame(
            [(float(i * 10 + j), f"r{i}-{j}") for j in range(10)],
            "VALUE double, TAG string",
        ).coalesce(1).write.mode("append").parquet(part)
    return root, part


@pytest.mark.parametrize("crash_after", ["stage", "manifest", "move", "delete"])
def test_compaction_crash_safe(spark, multi_file_partition, crash_after):
    """compactor.rs:645-749 durability: a crash at ANY swap boundary
    loses nothing — every row stays readable mid-crash (possibly
    double-counted in the bounded manifest→delete window, never
    absent), and re-running compaction rolls the swap forward to the
    exact pre-crash answer."""
    root, part = multi_file_partition

    def rows(df):
        # column-order-insensitive (compaction normalizes column order
        # alphabetically, matching the reference's sorted-fields schema)
        return {frozenset(r.asDict().items()) for r in df.collect()}

    before = rows(spark.read.parquet(root))
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_partition(spark, part, _crash_after=crash_after)
    # mid-crash: no row lost (duplicates allowed in the swap window)
    assert rows(spark.read.parquet(root)) == before
    # recovery (implicit in the next compaction pass) converges
    compact_partition(spark, part)
    after_df = spark.read.parquet(root)
    assert rows(after_df) == before
    assert after_df.count() == len(before)
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    assert not os.path.exists(os.path.join(part, "_COMPACT_MANIFEST.json"))
    assert not os.path.exists(
        os.path.join(
            os.path.dirname(part),
            ".compact_tmp_" + os.path.basename(part).replace("=", "-"),
        )
    )


def test_compaction_recompaction_no_name_collision(spark, multi_file_partition):
    """Second compaction: the previous compacted file is now a SOURCE;
    unique per-run output names keep the delete phase from removing
    the fresh output."""
    root, part = multi_file_partition
    before = {frozenset(r.asDict().items()) for r in spark.read.parquet(root).collect()}
    compact_partition(spark, part)
    # add one more small file, compact again
    import datetime

    spark.createDataFrame([(999.0, "late")], "VALUE double, TAG string").coalesce(
        1
    ).write.mode("append").parquet(part)
    compact_partition(spark, part)
    after = {frozenset(r.asDict().items()) for r in spark.read.parquet(root).collect()}
    late = frozenset(
        {"VALUE": 999.0, "TAG": "late", "date": datetime.date(2022, 7, 20)}.items()
    )
    assert after == before | {late}
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1


def test_compaction_file_uri_root(spark, multi_file_partition):
    """Discovery + swap + conservation all work on a file:// URI root
    (object-store code path: pyarrow.fs, no glob/os/shutil)."""
    root, part = multi_file_partition
    uri_root = "file://" + root
    before = spark.read.parquet(root).count()
    parts = partitions_needing_compaction(uri_root)
    assert parts == ["file://" + part]
    rows = compact_partition(spark, parts[0])
    assert rows == before
    assert spark.read.parquet(root).count() == before
    assert len(glob.glob(os.path.join(part, "*.parquet"))) == 1
    from nemscraper_spark.sources.nemcsv import _parquet_rows

    assert _parquet_rows(uri_root) == before

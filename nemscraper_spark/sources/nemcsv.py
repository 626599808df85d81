"""NEM-format CSV ingest: ZIP/CSV → typed, Hive-partitioned Parquet.

The NEM "multi-table CSV" grammar (reference: src/process/split.rs:64-125,
src/process/csv_batch_processor.rs:42-94; fixture spec FIXTURES.md §A):

    C,NEMP.WORLD,...                     file header — skipped
    I,FPP,UNIT_MW,1,<col4>,<col5>,...    schema row — starts a table block
    D,FPP,UNIT_MW,1,v4,v5,...            data rows for the current block
    I,...                                new schema row → new block
    C,"END OF REPORT",...                footer — stop

Table name = fields 1-3 of the I row joined "---" (chunk.rs:77-82);
the first 4 columns (marker, table, subtable, version) are dropped from
output (chunk.rs:336-345); rows before any I row are dropped
(csv_batch_processor.rs:72-74).

Spark execution model — one task per input file, matching the
reference's per-file worker pool (main.rs:208-239):

    binaryFile/wholetext scan → per-file python parse (mapInPandas —
    genuinely imperative text parsing, the one place SURVEY.md §7.1
    sanctions the slow path) → generic (file, table, headers, fields)
    rows → per-table projection + first-non-null type inference →
    cast plan (double / NEM timestamp / trimmed string) →
    write.partitionBy("date")

At 100TB the file corpus parallelizes as |files| tasks; each table's
convert/write is an independent job over a filtered view of the parsed
scan, which Spark caches once (the reference re-reads the CSV per batch
instead, chunk.rs:320-332).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nemscraper_spark.functions import (
    clean_str,
    date_from_filename,
    to_double,
    to_nem_timestamp,
)

PARSED_SCHEMA = (
    "src_file string, table_key string, headers array<string>, fields array<string>"
)
INFERENCE_SAMPLE_ROWS = 1000  # chunk.rs:324 — first 1k rows drive inference


def parse_files(spark: SparkSession, input_path: str | list[str]) -> DataFrame:
    """Scan ZIPs and/or raw CSVs → generic parsed rows.

    One input file = one Spark task (binaryFile rows are file-granular),
    so the ZIP-member iteration (split.rs:36-55) runs partition-parallel.
    ``input_path``: a directory/glob or an explicit list of files.
    """
    paths = input_path if isinstance(input_path, list) else [input_path]
    binf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.[zZcC][iIsS][pPvV]*")  # *.zip / *.csv
        .load(paths)
        .select("path", "content")
    )

    def extract(iterator):
        import io
        import os as _os
        import zipfile

        import pandas as pd

        for pdf in iterator:
            out = {"src_file": [], "table_key": [], "headers": [], "fields": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                base = _os.path.basename(path)
                members = []
                if base.lower().endswith(".zip"):
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        for m in zf.namelist():
                            if m.lower().endswith(".csv"):
                                members.append((base, zf.read(m).decode("utf-8", "replace")))
                else:
                    members.append((base, bytes(content).decode("utf-8", "replace")))
                for src, text in members:
                    import csv as _csv
                    import io as _io

                    current_key = None
                    current_headers = None
                    for row in _csv.reader(_io.StringIO(text)):
                        if not row:
                            continue
                        if row[0] == "I":
                            if len(row) < 5:
                                continue
                            current_key = "---".join(row[1:4])
                            current_headers = row[4:]
                        elif row[0] == "D" and current_key is not None:
                            fields = row[4:]
                            if len(fields) < len(current_headers):
                                fields = fields + [None] * (
                                    len(current_headers) - len(fields)
                                )
                            else:
                                fields = fields[: len(current_headers)]
                            out["src_file"].append(src)
                            out["table_key"].append(current_key)
                            out["headers"].append(current_headers)
                            out["fields"].append(fields)
            # object dtype keeps Arrow happy when a batch has ZERO D
            # rows (default empty-frame dtype is float64, which can't
            # convert to list<string>)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return binf.mapInPandas(extract, schema=PARSED_SCHEMA)


def _looks_float(s: str) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


def _looks_nem_ts(s: str) -> bool:
    from datetime import datetime

    try:
        datetime.strptime(s, "%Y/%m/%d %H:%M:%S")
        return True
    except (TypeError, ValueError):
        return False


def infer_types(samples: dict[str, str | None]) -> dict[str, str]:
    """First-non-null single-value inference (chunk.rs:85-130):
    parses-as-f64 → double; parses NEM ts → timestamp; else string.
    Returns column → {'double','timestamp','string'}."""
    plan = {}
    for col, v in samples.items():
        if v is not None and _looks_float(v):
            plan[col] = "double"
        elif v is not None and _looks_nem_ts(v):
            plan[col] = "timestamp"
        else:
            plan[col] = "string"
    return plan


def table_frame(parsed: DataFrame, table_key: str, sample=None) -> DataFrame:
    """Project one table's rows out of the generic parsed scan and apply
    the reference's cleaning + type inference."""
    sub = parsed.filter(F.col("table_key") == table_key)
    # ONE sample job covers both header discovery and type inference
    # (was first() + a second limit().collect() — at 2 tables x 2
    # ingest calls the extra job round-trips dominate small batches);
    # ingest() pre-collects samples for ALL tables in a single job and
    # passes them in
    if sample is None:
        sample = sub.select("headers", "fields").limit(INFERENCE_SAMPLE_ROWS).collect()
    if not sample:
        raise KeyError(f"no rows for table {table_key!r}")
    headers = list(sample[0]["headers"])

    def _clean_py(v):
        # python twin of clean_str + empty-string→null, for inference
        # over the collected sample only (the data path cleans in Spark)
        if v is None:
            return None
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
        return v or None

    samples: dict[str, str | None] = {}
    for i, h in enumerate(headers):
        samples[h] = next(
            (
                _clean_py(r["fields"][i])
                for r in sample
                if i < len(r["fields"]) and _clean_py(r["fields"][i]) is not None
            ),
            None,
        )
    plan = infer_types(samples)

    raw = sub.select(
        "src_file",
        *[clean_str(F.col("fields")[i]).alias(h) for i, h in enumerate(headers)],
    )
    # empty strings are nulls (chunk.rs:211-216 parses "" to None)
    raw = raw.select(
        "src_file",
        *[F.when(F.col(h) == "", None).otherwise(F.col(h)).alias(h) for h in headers],
    )

    cols = []
    for h in headers:
        if plan[h] == "double":
            cols.append(to_double(F.col(h)).alias(h))
        elif plan[h] == "timestamp":
            cols.append(to_nem_timestamp(F.col(h)).alias(h))
        else:
            cols.append(F.col(h).alias(h))
    return raw.select("src_file", *cols)


def ingest(
    spark: SparkSession,
    input_path: str | list[str],
    out_dir: str,
    compression: str = "zstd",
) -> dict[str, int]:
    """Full S4-S7 pipeline: parse → per-table typed frames → Hive
    `date=` partitioned parquet under out_dir/<TABLE>/.

    Partition value = date extracted from the source FILENAME
    (chunk.rs:258-308, 348-351), not from row data. Compression: zstd
    (the reference's brotli-5 needs an extra codec jar on Spark's
    classpath — documented deviation, SURVEY.md §7.1).

    Returns {table_key: row_count} so callers can run the conservation
    check (verify.rs:56-133: D-row count == parquet row count).
    """
    from pyspark.sql import Window

    parsed = parse_files(spark, input_path).cache()
    try:
        # ONE job discovers the table list AND collects each table's
        # inference sample (first N parsed rows per table)
        w = Window.partitionBy("table_key").orderBy(
            F.monotonically_increasing_id()
        )
        sample_rows = (
            parsed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= INFERENCE_SAMPLE_ROWS)
            .select("table_key", "headers", "fields")
            .collect()
        )
        samples_by_table: dict[str, list] = {}
        for r in sample_rows:
            samples_by_table.setdefault(r["table_key"], []).append(r)

        written: dict[str, int] = {}
        for key in sorted(samples_by_table):
            df = table_frame(parsed, key, sample=samples_by_table[key])
            out = df.withColumn("date", date_from_filename(F.col("src_file"))).drop(
                "src_file"
            )
            path = os.path.join(out_dir, key)
            out.write.mode("append").partitionBy("date").option(
                "compression", compression
            ).parquet(path)
            # conservation count from the written footers (metadata
            # only — no extra scan job; verify.rs:56-133 semantics)
            written[key] = _parquet_rows(path)
        return written
    finally:
        parsed.unpersist()


def _parquet_rows(table_root: str) -> int:
    """Total rows under a table dir from parquet footers (no Spark job)."""
    import glob as _glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(
            os.path.join(table_root, "**", "*.parquet"), recursive=True
        )
    )

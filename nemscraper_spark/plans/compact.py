"""Partition compaction with schema evolution (SURVEY.md §2.8 M4;
reference src/bin/compactor.rs:584-792).

Per `table/date=` partition: resolve the evolved schema from parquet
footers (metadata only), stream-convert every small file + any previous
compacted file into ONE file, atomically swap. Spark-first:

  * evolved schema + casts: sources/evolve.read_evolved
  * single-file output: .repartition(1) scoped to the one partition
  * atomic swap: dynamic partition overwrite (the engine-level
    equivalent of the reference's .tmp + rename, compactor.rs:645-749 —
    Spark's commit protocol stages and renames for us)

At scale each partition is an independent job; the driver loops (or
schedules a pool of) partitions exactly like the compactor's rayon
scope (compactor.rs:76-94). A 100TB table compacts incrementally —
only partitions with >1 file are touched.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from nemscraper_spark.sources.evolve import read_evolved


def partitions_needing_compaction(table_root: str, min_files: int = 2) -> list[str]:
    """Partition dirs with at least ``min_files`` parquet files."""
    out = []
    for part in sorted(glob.glob(os.path.join(table_root, "date=*"))):
        if len(glob.glob(os.path.join(part, "*.parquet"))) >= min_files:
            out.append(part)
    return out


def compact_partition(spark: SparkSession, partition_dir: str) -> int:
    """Rewrite one partition's files as a single evolved-schema file.
    Returns the row count of the compacted partition."""
    files = sorted(glob.glob(os.path.join(partition_dir, "*.parquet")))
    if not files:
        return 0
    df = read_evolved(spark, files).repartition(1)
    tmp = partition_dir.rstrip("/") + ".compact-tmp"
    # zstd for density at rest (the cold path — ingest writes snappy,
    # see sources/nemcsv.ingest); the zstd-jni buffer pool is disabled:
    # with it on, repeated partitioned zstd writes degraded 9s -> 85s
    # in-session (native buffer growth), without it they hold ~1-4s
    df.write.mode("overwrite").option("compression", "zstd").option(
        "parquet.compression.codec.zstd.bufferPool.enabled", "false"
    ).parquet(tmp)
    # row count from the staged footers (metadata-only, no extra job)
    import pyarrow.parquet as pq

    rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(tmp, "*.parquet"))
    )
    # atomic-ish swap mirroring compactor.rs:645-749 (.tmp + rename)
    import shutil

    staged = [f for f in glob.glob(os.path.join(tmp, "*.parquet"))]
    for f in files:
        os.remove(f)
    for i, f in enumerate(staged):
        shutil.move(f, os.path.join(partition_dir, f"compacted-{i}.parquet"))
    shutil.rmtree(tmp)
    return rows


def compact_table(spark: SparkSession, table_root: str) -> dict[str, int]:
    """Compact every eligible partition of one table (the compactor's
    5-minute cycle body, compactor.rs:63-110)."""
    results = {}
    for part in partitions_needing_compaction(table_root):
        results[part] = compact_partition(spark, part)
    return results

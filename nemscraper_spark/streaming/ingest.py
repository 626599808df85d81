"""Continuous ingest as Structured Streaming (SURVEY.md §2.9).

The reference's 'streaming' is micro-batch file-arrival processing with
filename-keyed exactly-once (urls.rs:167-209 60s poll → channel →
worker pools). Spark mapping:

  * file source over the ZIP landing directory (binaryFile) — the
    source's checkpoint IS the reference's `downloaded`/`processed`
    dedup set (M1/M2): each file is processed exactly once across
    restarts, no in-memory HashSet to hydrate.
  * foreachBatch runs the same batch ingest (sources/nemcsv.ingest's
    parse→infer→write) — identical semantics batch vs stream.
  * Trigger.ProcessingTime("60 seconds") ↔ the 60s poll cadence;
    tests use availableNow to drain synchronously.

No watermarks/late-data policy — the reference has none (§2.9): late
files ride the same dedup-by-filename path, and event time only enters
via the filename-derived date= partition.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


def start_ingest_stream(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 60,
    available_now: bool = False,
    history=None,
) -> StreamingQuery:
    """Watch ``landing_dir`` for new ZIP/CSV files and ingest each
    micro-batch with the batch pipeline. Returns the running query.

    ``history``: optional plans.history.TableHistory('processed') — a
    row is appended per processed file (main.rs:262-275), on top of the
    checkpoint's exactly-once guarantee.
    """
    stream = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema — binaryFile's is fixed
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.[zZcC][iIsS][pPvV]*")
        .load(landing_dir)
        .select("path", "length")
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        from datetime import datetime

        from nemscraper_spark.sources.nemcsv import ingest

        files = [r.path for r in batch_df.select("path").collect()]
        if not files:
            return
        t0 = datetime.now()
        counts = ingest(batch_df.sparkSession, files, out_dir)
        if history is not None:
            t1 = datetime.now()
            history.add(
                [
                    {
                        "filename": f.rsplit("/", 1)[-1],
                        "total_rows": sum(counts.values()),
                        "size_bytes": None,
                        "processing_start": t0,
                        "processing_end": t1,
                        "thread": epoch_id,
                    }
                    for f in files
                ]
            )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

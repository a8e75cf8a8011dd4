"""Structured Streaming ingestion wrapper.

The reference is a request/response service with no stream processing
(SURVEY.md §2D), so batch is the primary mode — but continuous corpus
ingestion is the realistic deployment for a crawl pipeline, so this
wraps the SAME extraction dataflow in a file-source stream with
``foreachBatch``: each micro-batch goes through validate -> kernel ->
dedup-within-batch -> snapshot commit, giving exactly-once table
appends on top of Spark's checkpointed source offsets plus our
audit-table anti-join (double idempotency: offsets dedupe files,
the audit dedupes urls across restarts).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..pipeline.run import run_extraction_job
from ..schema import PAGES_SCHEMA

__all__ = ["stream_extraction", "stream_windowed_metrics"]


def stream_extraction(spark: SparkSession, input_dir: str, out_root: str,
                      checkpoint_dir: str | None = None,
                      available_now: bool = True,
                      salt_partitions: int | None = None):
    """Stream parquet ``pages`` files from ``input_dir`` into the
    extraction tables under ``out_root``.

    ``available_now=True`` drains everything currently present and
    stops (batch-like catch-up); ``False`` runs continuously on new
    files. Returns the StreamingQuery."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_root, "_stream_ckpt")

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", "64")
              .parquet(input_dir))

    def process_batch(batch_df, batch_id: int):
        run_extraction_job(batch_df.sparkSession, batch_df, out_root,
                           salt_partitions=salt_partitions)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_metrics(spark: SparkSession, input_dir: str,
                            out_dir: str, checkpoint_dir: str | None = None,
                            window: str = "1 hour",
                            watermark: str = "10 minutes",
                            available_now: bool = True):
    """Continuous ingest monitoring: per-(event-time window, lang) doc
    counts and byte volumes over the pages stream — the streaming
    analogue of the batch hour-histogram queries.

    Event time is ``warc_ts`` (when the page was crawled, not when the
    file arrived), with a watermark bounding how late a page may arrive
    and still count. Append output mode writes each window exactly once,
    when the watermark passes its end — so the parquet sink is
    append-only and safely consumable while the stream runs. Rows later
    than the watermark are dropped by contract (counted nowhere), which
    is what bounds aggregation state at 100 TB: open state is
    O(open windows x langs), independent of corpus size, and the
    watermark survives restarts via the checkpoint."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_ckpt")
    from pyspark.sql import functions as F

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", "64")
              .parquet(input_dir))
    agg = (stream
           .withWatermark("warc_ts", watermark)
           .groupBy(F.window("warc_ts", window).alias("win"), "lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.length("html")).alias("bytes_in")))
    flat = agg.select(F.col("win.start").alias("window_start"),
                      F.col("win.end").alias("window_end"),
                      "lang", "n_docs", "bytes_in")
    writer = (flat.writeStream.outputMode("append")
              .format("parquet").option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

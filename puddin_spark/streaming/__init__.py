"""Structured Streaming ingestion for the quality-filter pipeline.

The reference is pure batch (SURVEY.md section 2.10) — this module is the
graft's continuous-ingestion surface: a file-stream of page parquet drops
(the shape a crawl delivers) processed with the SAME batch pipeline body via
foreachBatch, committing each micro-batch to the SnapshotStore. Resume
semantics compose: the store's url/text-digest anti-joins make reprocessing
idempotent even if a micro-batch is replayed after a crash, and Spark's
checkpointLocation tracks stream progress.

Watermarking note: verdicts are per-document (no event-time aggregation), so
no watermark is required for correctness; `windowed_page_counts` shows the
watermarked-window form for monitoring-style aggregations over warc_ts.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from puddin_spark.snapshots import SnapshotStore, run_resumable_pipeline
from puddin_spark.synth import SPARK_SCHEMA_DDL


def stream_pages(spark: SparkSession, input_dir: str, max_files: int = 8) -> DataFrame:
    """File-stream source of page parquet drops (explicit schema — no
    sampling pass; maxFilesPerTrigger bounds micro-batch size)."""
    return (
        spark.readStream.schema(SPARK_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def run_streaming_pipeline(
    spark: SparkSession,
    input_dir: str,
    store: SnapshotStore,
    checkpoint_dir: str,
    *,
    num_partitions: int = 32,
    available_now: bool = True,
):
    """Continuous ingestion: each micro-batch runs the batch pipeline body
    and commits atomically. Returns the StreamingQuery (caller awaits)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_resumable_pipeline(
            spark, batch_df, store, num_partitions=num_partitions
        )

    writer = (
        stream_pages(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_page_counts(
    pages_stream: DataFrame, window: str = "1 hour", late: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time aggregation over warc_ts (rows later than the
    watermark delay are dropped) — the monitoring-side streaming pattern."""
    return (
        pages_stream.withWatermark("warc_ts", late)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select("w.start", "w.end", "lang", "n_pages")
    )

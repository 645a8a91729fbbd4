"""Structured-Streaming ingest: the PostIngestQueue recast.

The reference ingests through an async multi-stage queue (Extraction →
KnowledgeGraph/Symbol/Entity/Title → Embeddings; PostIngestQueue.h:361-372,
PostIngestQueue.cpp:289-500) with per-stage concurrency and resume. There
are no event-time semantics in the reference (ordering is by monotonically
increasing ids; indexed_time is processing-time), so the Spark recast is a
file-source stream of page batches driven through the same signature stage
via ``foreachBatch``, with per-batch watermark rows written to the metrics
table. foreachBatch is at-least-once, so each micro-batch write is made
idempotent by partitioning on ``batch_id`` with dynamic partition
overwrite: a replayed batch rewrites its own partition instead of
appending duplicates, and the checkpointLocation gives resume (the WAL
analog, wal_manager.h:23-80).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yams_spark.operators.signatures import signatures_stage

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def start_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Stream page parquet files from ``input_dir`` through extraction +
    signatures into ``output_dir`` (parquet), with a metrics row per batch.

    Returns the StreamingQuery. ``trigger_once`` processes the backlog and
    stops (the batch-resume pattern); otherwise it micro-batches forever.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_dir)
    )

    sig_path = os.path.join(output_dir, "signatures.parquet")
    metrics_path = os.path.join(output_dir, "stream_metrics.parquet")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a batch replayed after a mid-batch
        # failure must not duplicate rows. Partitioning by batch_id with
        # dynamic partition overwrite makes the replay idempotent — the
        # rewritten partition replaces any partial output of the failed
        # attempt, and committed batch_ids are simply rewritten in place.
        sig = signatures_stage(batch_df).withColumn("batch_id", F.lit(int(batch_id)))
        (
            sig.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sig_path)
        )
        row = batch_df.sparkSession.createDataFrame(
            [(int(batch_id),)], "batch_id long"
        ).select(
            "batch_id",
            F.lit("stream_sign").alias("stage"),
            F.current_timestamp().alias("watermark_ts"),
        )
        (
            row.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(metrics_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the late-data pattern (no reference analog; standard Structured
    Streaming for the streaming-only operator inventory)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> TZ
        .withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )

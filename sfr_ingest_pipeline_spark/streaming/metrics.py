"""Streaming throughput metrics: a genuine stateful Structured Streaming op
(SURVEY.md §2.9 T3) running BESIDE the apply loop.

Tumbling event-time windows with a watermark aggregate the change tail into
per-(window, op) counts appended to a parquet metrics table — the CloudWatch
analog of the reference's per-invocation telemetry (SURVEY.md §2.4 A1). The
watermark bounds state: windows older than (max event time - delay) finalize
and leave the state store, so the aggregation runs forever at O(open
windows) memory — the correct shape for an unbounded 10^10-event tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfr_ingest_pipeline_spark.schema import CHANGE_EVENT_SCHEMA


def windowed_op_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per-(event-time window, op) counts + distinct-conversation estimate.

    Works on both batch and streaming frames; on a stream, requires append
    output mode (watermark finalizes windows)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op", "n_events", "approx_convs",
        )
    )


def monitor_stream(
    spark: SparkSession,
    binlog_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    event_schema: T.StructType = CHANGE_EVENT_SCHEMA,
    window: str = "1 minute",
    watermark_delay: str = "2 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = 1,
):
    """Start the metrics side-stream: binlog tail -> watermarked tumbling
    aggregation -> append-mode parquet sink. Returns the StreamingQuery.

    The watermark only advances BETWEEN microbatches, and append mode emits a
    window only once the watermark passes it — so a bounded replay must run
    several microbatches (default one file per trigger) for windows to close;
    the trailing windows stay open until more data (or a later run) advances
    the watermark past them."""
    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(binlog_dir)
    metrics = windowed_op_counts(events, window, watermark_delay)
    writer = (
        metrics.writeStream.format("parquet")
        .option("path", metrics_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("cdc-metrics")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Incremental ingest as Structured Streaming.

The reference's "streaming" is a 15-minute poll loop re-listing the
whole remote tree (S5, /root/reference/src/DropboxSynchronizer/
DropboxSynchronizer.class.js:64-110, interval at config/
AppConfig.const.js:26). The Spark-first replacement is a file-source
stream with ``Trigger.AvailableNow``: each invocation processes exactly
the files that appeared since the last checkpointed offset, then stops —
deterministic incremental batch, no custom diff bookkeeping (the stream
checkpoint IS the fileLib state S1-S3 maintained by hand).

The extraction transform is the same pure-columnar stage as batch —
one definition, two execution modes.

At scale: the file-source checkpoint tracks seen files; compaction via
``maxFilesPerTrigger``/``latestFirst`` options; for true continuous
ingest swap the trigger for ``processingTime``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_spans_columnar
from ..schemas import DOCUMENTS


def stream_extract(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint_path: str,
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
):
    """documents parquet dir (growing) → extracted_spans parquet, exactly
    the new files each run (Trigger.AvailableNow).

    ``max_files_per_trigger`` splits the available backlog into multiple
    micro-batches (AvailableNow honors it) — bounded state/commit units
    at scale, and the lever the kill-and-resume chaos test uses to stop a
    run with the backlog half-committed."""
    reader = spark.readStream.schema(DOCUMENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)
    extracted = extract_spans_columnar(src)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


# Watermarks require TIMESTAMP_LTZ event time (EVENT_TIME_IS_NOT_ON_
# TIMESTAMP_TYPE on NTZ) — the explicit schema forces the LTZ read; the
# batch twin must read with the same schema for window-boundary parity.
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_hourly_event_counts(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "2 hours",
    await_termination: bool = True,
):
    """Windowed streaming aggregation with late-data handling: tumbling
    1-hour counts per event_type, watermarked. With AvailableNow this is
    the incremental-batch twin of the batch ``events_hourly`` query —
    same logical plan, plus state store + watermark semantics."""
    src = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def batch_hourly_event_counts(events: DataFrame) -> DataFrame:
    """The batch twin of ``stream_hourly_event_counts`` for equivalence
    tests (same plan minus the state store)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )

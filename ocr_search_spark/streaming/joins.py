"""Stream-stream interval join: event-time attribution across two
live streams.

The reference has no streaming join at all — its closest analogue is
re-listing the remote tree and diffing by hand
(DropboxSynchronizer.class.js:64-110). The Spark-first capability this
adds: join two UNBOUNDED streams (e.g. click events against the view
events that preceded them) with bounded state, by declaring

  * a watermark on BOTH sides (how late either stream may be), and
  * an event-time range on the join condition (how far apart matching
    rows may be),

so Structured Streaming can expire join state deterministically: a
buffered view is dropped once the click watermark passes
``view.ts + window`` — state size ∝ window × arrival rate, never the
full history. Inner-join results emit as matches arrive (no
watermark-close latency), which is why the batch twin below is an
EXACT equality check, not an eventually-consistent one.

At 100 TB/day event volume this is the shape that replaces the
"materialize both streams, nightly batch join" pipeline: the shuffle is
keyed on ``user_id`` exactly like the batch join, but state holds only
the attribution window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_WINDOW_S = 600
DEFAULT_LATENESS = "30 minutes"

_EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _attr_join(clicks: DataFrame, views: DataFrame, window_s: int) -> DataFrame:
    """click ⋈ views of the same user in (click.ts − window, click.ts]."""
    c, v = clicks.alias("c"), views.alias("v")
    cond = F.expr(
        "c.user_id = v.user_id"
        " AND v.ts <= c.ts"
        f" AND v.ts >= c.ts - INTERVAL {int(window_s)} SECONDS"
    )
    return c.join(v, cond, "inner").select(
        F.col("c.event_id").alias("click_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("v.ts").alias("view_ts"),
    )


def stream_attribute_clicks(
    spark: SparkSession,
    views_path: str,
    clicks_path: str,
    out_path: str,
    checkpoint_path: str,
    window_s: int = DEFAULT_WINDOW_S,
    lateness: str = DEFAULT_LATENESS,
    await_termination: bool = True,
):
    """Two growing parquet dirs of events → attributed (click, view)
    pairs, incrementally (Trigger.AvailableNow), exactly-once across
    restarts via the stream checkpoint. Both sides carry a watermark so
    the join state is BOUNDED: views older than
    ``click watermark − window − lateness`` are evicted."""
    views = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .parquet(views_path)
        .withWatermark("ts", lateness)
    )
    clicks = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .parquet(clicks_path)
        .withWatermark("ts", lateness)
    )
    q = (
        _attr_join(clicks, views, window_s)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def batch_attribute_clicks(
    views: DataFrame, clicks: DataFrame, window_s: int = DEFAULT_WINDOW_S
) -> DataFrame:
    """The batch twin: identical join semantics on static frames."""
    return _attr_join(clicks, views, window_s)

"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10) — its "incrementality" is
a daily MERGE job. This module adds the thin streaming ingestion option
the extension surface mandates: the SAME tumbling-window aggregation
expression runs in batch (oracle-checkable, `stream_tumbling` query) and
under ``readStream`` with a watermark for late data.

Scale design: tumbling windows + watermark keep state bounded (one
window per key in flight); the shuffle is on (window, key) — the same
partitioning batch would use. Sinks are append-mode once the watermark
closes a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, ts_col: str = "ts",
                 window: str = "1 hour",
                 key_col: str = "event_type",
                 value_col: str = "value",
                 watermark: str | None = None,
                 slide: str | None = None) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) window count + decimal sum,
    batch or streaming.

    With ``watermark`` set (streaming), rows later than the watermark
    past the window end are dropped and state is reclaimed; a sliding
    window keeps width/slide windows of state per key in flight.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (events
            .groupBy(F.window(ts_col, window, slide or window).alias("w"),
                     key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,6)"))
                 .cast("decimal(38,6)").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), key_col,
                    "n_events", "total_value"))


def read_event_stream(spark: SparkSession, path: str, schema,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-based event stream (parquet micro-batches).

    In production this is a Kafka/queue source; the file source has the
    same semantics (exactly-once per file, ordered discovery).
    """
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_tumbling_agg(stream: DataFrame, ts_col: str = "ts",
                        window: str = "1 hour", key_col: str = "event_type",
                        value_col: str = "value",
                        watermark: str = "2 hours"):
    """The streaming plan: watermark + tumbling agg, ready for
    ``.writeStream.outputMode("append")`` once windows close."""
    return tumbling_agg(stream, ts_col, window, key_col, value_col,
                        watermark=watermark)


def interval_stream_join(left: DataFrame, right: DataFrame,
                         left_ts: str = "ts", right_ts: str = "ts",
                         key: str = "user_id",
                         tolerance: str = "30 minutes",
                         left_watermark: str = "1 hour",
                         right_watermark: str = "1 hour",
                         how: str = "inner") -> DataFrame:
    """Stream-stream equi-join with an event-time interval condition.

    Both sides carry a watermark and the join adds a time-range bound
    (right within [left_ts, left_ts + tolerance]), which is what lets
    Spark expire buffered state: without the range, each side's state
    would grow forever. Works identically in batch (the watermark is a
    no-op there), so the semantics are testable both ways.

    ``how='left_outer'`` (or right/full) emits unmatched rows with NULLs
    once the watermark proves no match can still arrive — the outer
    result is therefore watermark-delayed in streaming mode, while batch
    emits it immediately (same rows, different latency).
    """
    l, r = left.alias("l"), right.alias("r")
    if left.isStreaming:
        l = left.withWatermark(left_ts, left_watermark).alias("l")
    if right.isStreaming:
        r = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {tolerance}"))
    )
    return l.join(r, cond, how)


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           watermark: str = "1 hour") -> DataFrame:
    """At-least-once -> effectively-once: drop duplicate (keys) arrivals
    within the watermark horizon, with bounded state.

    Streaming uses ``dropDuplicatesWithinWatermark`` (state for a key is
    reclaimed once the watermark passes it — a plain dropDuplicates
    would keep every key ever seen). Batch falls back to dropDuplicates
    for the same semantics on a finite input.
    """
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)

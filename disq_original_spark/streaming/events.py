"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY §2.7); this module supplies the streaming
surface the prompt's checklist requires, built on the canonical patterns:
file/rate source → watermark → windowed agg / stateful dedup → sink.  Each
operator has a batch twin so tests can check streaming output against a
batch-computed expectation (DuckDB has no streaming oracle).

Scale notes: windowed aggregation state is partitioned by (window, keys) —
the shuffle is the same hash shuffle as the batch groupBy; the watermark
bounds state size.  dropDuplicatesWithinWatermark keeps one entry per key in
the state store, evicted at watermark passage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark.
    Batch twin: q30_tumbling_window (modulo the explicit window struct)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch-computed expectation for ``windowed_counts`` (same plan minus
    the watermark node)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state
    (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def sliding_window_value(events: DataFrame, window: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding-window sum of value per type (overlapping windows)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "sv",
        )
    )

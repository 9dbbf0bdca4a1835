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


def sum_value_e2(col: str = "value") -> F.Column:
    """Order-safe 2-decimal sum of a price-like double column (p05 integer
    pattern, SCALE.md 'Float-aggregation order').

    The generator writes ``value`` with exactly 2 decimals, so
    ``round(value*100)`` recovers its e2 integer exactly (robust even to
    float32-level noise: anything within 0.5 cents rounds home).  Integer
    sums are addition-order independent — exact in a long, and exact even
    through a double accumulator below 2^53 — so the hash witness cannot
    flip with partial-sum order the way ``round(sum(double), 2)`` can.
    The final ``/100.0`` is one deterministic float op on an exact integer.
    Oracle twin: ``sum(CAST(round(value*100) AS BIGINT)) / 100.0``.
    """
    return F.sum(F.round(F.col(col) * 100).cast("long")) / F.lit(100.0)


def _windowed_counts_agg(events: DataFrame, window: str) -> DataFrame:
    """Shared aggregation body of windowed_counts and its batch twin — one
    definition so the streaming-vs-batch differential can never drift."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), sum_value_e2().alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark.
    Batch twin: q30_tumbling_window (modulo the explicit window struct)."""
    return _windowed_counts_agg(events.withWatermark("ts", watermark), window)


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch-computed expectation for ``windowed_counts`` (same plan minus
    the watermark node)."""
    return _windowed_counts_agg(events, window)


def _session_windows_agg(events: DataFrame, gap: str) -> DataFrame:
    """Shared aggregation body of session_windows and its batch twin."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), sum_value_e2().alias("sv"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sv",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation per user: events within ``gap`` of each
    other merge into one session.  State per (user, open session); the
    watermark closes sessions and bounds state."""
    return _session_windows_agg(events.withWatermark("ts", watermark), gap)


def session_windows_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch twin of ``session_windows`` (same plan minus the watermark)."""
    return _session_windows_agg(events, gap)


_USER_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
# State carries the value sum as exact e2 integer cents (p05 pattern —
# see sum_value_e2): long += long is order-safe across micro-batches,
# where a float accumulator would make the emitted total depend on
# batch arrival order.
_USER_TOTALS_STATE = "n long, total_e2 long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count and value sum, emitted each micro-batch in update mode.

    This is the canonical shape for operators Spark's built-ins can't
    express (per-key mutable state + arbitrary Python update logic).  State
    is one (n, total) pair per user — partitioned by the groupBy hash
    shuffle, so it scales horizontally with executors; no watermark is set
    because totals are cumulative forever (a production variant would set a
    state TTL via GroupStateTimeout)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total_e2 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # e2-exact data: value*100 sits within float noise of its cent
            # integer, so .round() recovers it; the sum of those integers
            # is exact in float64 below 2^53 and int() makes it a long.
            total_e2 += int((pdf["value"] * 100).round().sum())
        state.update((n, total_e2))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_e2 / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_USER_TOTALS_SCHEMA,
        stateStructType=_USER_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``running_user_totals`` final state."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_value_e2().alias("total_value"),
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state
    (dropDuplicatesWithinWatermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def sliding_window_value(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window sum of value per type (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(sum_value_e2().alias("sv"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "sv",
        )
    )


def enriched_segment_totals(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static enrichment: join the event stream to a static customer
    dimension on user_id and aggregate per market segment — the canonical
    dimension-enrichment pipeline (clickstream × user table).

    Stream-static joins are STATELESS in Structured Streaming: each
    micro-batch joins against the static side — no state store, no
    watermark needed for the join itself.  No broadcast hint: the customer
    dimension SCALES WITH sf, so the size-based planner (64 MB threshold +
    AQE demotion) must keep the choice — a forced hint would ship the whole
    dimension from the driver every micro-batch at large sf.  The aggregate
    keys on the enriched segment column, so state is bounded by segment
    cardinality regardless of stream volume."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.join(dim, "user_id")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum_value_e2().alias("total_value"),
        )
    )


def enriched_segment_totals_batch(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Batch twin of ``enriched_segment_totals``."""
    return enriched_segment_totals(events, customers)


def content_hash() -> F.Column:
    """Engine-stable event content hash: md5 over pipe-joined string-safe
    fields (user_id casts to decimal text identically in Spark and DuckDB;
    the float ``value`` column is deliberately excluded — double→string
    formatting differs across engines)."""
    return F.md5(
        F.concat_ws("|", F.col("user_id"), F.col("event_type"), F.col("props")).cast(
            "binary"
        )
    )


def novel_event_totals(events: DataFrame, seen: DataFrame) -> DataFrame:
    """Streaming ingest dedup — the streaming twin of d09's incremental
    batch dedup: drop every stream event whose content hash already exists
    in the static already-ingested index, then aggregate what's genuinely
    new per event type.

    Stream-static LEFT ANTI joins are STATELESS in Structured Streaming —
    each micro-batch probes the static side, no state store, no watermark
    for the join itself; the aggregate's state is bounded by event-type
    cardinality.  No broadcast hint: the already-ingested index grows with
    the whole corpus, so the size-based planner must be free to pick a
    shuffled anti-join once it outgrows the broadcast threshold.  Duplicates WITHIN one batch
    both pass (the index only knows prior corpus content) — in-stream
    dedup is st03's dropDuplicatesWithinWatermark, a separate concern.
    """
    h = events.withColumn("h", content_hash())
    novel = h.join(seen, "h", "left_anti")
    return novel.groupBy("event_type").agg(
        F.count("*").alias("n_new"),
        sum_value_e2().alias("total_value"),
    )


def novel_event_totals_batch(events: DataFrame, seen: DataFrame) -> DataFrame:
    """Batch twin of ``novel_event_totals``."""
    return novel_event_totals(events, seen)

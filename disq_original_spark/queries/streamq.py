"""Structured Streaming surfaced through the driver registry (st01).

The streaming operators live in ``disq_original_spark.streaming.events`` and
are differential-tested (stream vs batch twin) in ``tests/test_streaming.py``.
This module additionally runs ONE of them end-to-end through the standard
``queries()`` contract so the correctness harness exercises a real
``readStream → watermark → window agg → sink`` pipeline: the file stream is
drained with ``Trigger.AvailableNow`` into a memory sink in complete mode,
and the final table is returned as an ordinary DataFrame.  Because
available-now processes the whole (single-file) input in one micro-batch,
the watermark drops nothing and the result equals the batch aggregation —
so this query is fully DuckDB-oracle-checkable, not rows-only.

Scale note: the streaming plan is the same hash shuffle as the batch
groupBy, keyed by (window, event_type); the watermark bounds state store
size in a true continuous run.  Complete-mode memory sink is test/driver
plumbing only — a production sink would be kafka/parquet in update mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events import windowed_counts
from ..tables import normalize_event_ts
from .registry import query

def _drain_to_memory(
    spark: SparkSession, sdf: DataFrame, mode: str, key: str
) -> DataFrame:
    """Start ``sdf`` into a memory sink named after ``key`` with
    availableNow, wait for the drain (bounded — a wedged drain raises
    instead of hanging the driver's whole query sweep), and return the sink
    table.  Sink names are PER QUERY KEY, so repeated builds of the same
    query (bench warm+timed passes, repeated driver witnesses) replace one
    bounded temp view instead of leaking a new one per run.

    State-store partition count: a streaming query's stateful exchange uses
    ``spark.sql.shuffle.partitions`` AT QUERY START, and every state
    partition costs a store instance + task per micro-batch — pure overhead
    when state cardinality (windows × types, open sessions, distinct keys in
    the horizon) is far below the batch shuffle width.  Size it to ~cores/8
    with a floor of 4: on a 1000-core cluster that still yields over a
    hundred state partitions, while the local harness stops paying store
    instances to hold a few thousand groups.  r12 measured cores/4+floor-8
    at st01 1.37 s → 0.80 s vs the raw 32; the r14 re-profile (stage table:
    the drain's 8-task state stage carried 1.4-2.8 task-seconds against a
    ~1.0 s measured machinery floor for a stateless drain) showed remaining
    headroom, and the interleaved A/B at sf0.1 (min/med of 6) confirmed:
    8 parts 1.406/1.651 s → 4 parts 1.211/1.414 s, faster in all six
    rounds.  The batch conf is restored after the drain."""
    name = f"st_sink_{key}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    state_parts = max(4, spark.sparkContext.defaultParallelism // 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(state_parts))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout=600):
                raise RuntimeError(
                    f"streaming drain {name} did not finish within 600s"
                )
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def _events_stream(spark: SparkSession, sf: str) -> DataFrame:
    """readStream over the events table with the ts physical-type handling
    shared with tables.load_table (normalize_event_ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    # FileStreamSource insists the source path be a directory; a glob that
    # resolves to the single file satisfies it (basePath = parent).
    return normalize_event_ts(spark.readStream.schema(schema).parquet(f"{sf}/events.*"))


@query(
    "st01_stream_tumbling",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
              event_type, count(*) AS cnt, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sv
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Tumbling-window streaming aggregation run through a real "
    "readStream→writeStream pipeline (availableNow trigger, memory sink) "
    "and checked against the batch SQL oracle — the streaming/batch "
    "unification Structured Streaming promises, made a test contract.",
)
def st01(spark: SparkSession, sf: str) -> DataFrame:
    stream = _events_stream(spark, sf)
    sink = _drain_to_memory(spark, windowed_counts(stream), "complete", "st01")
    return sink.orderBy("window_start", "event_type")


@query(
    "st02_stream_stream_join",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events
               WHERE event_type = 'click')
       SELECT p.user_id, count(*) AS n_pairs
       FROM p JOIN c ON c.user_id = p.user_id
         AND c.cts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
       GROUP BY p.user_id ORDER BY p.user_id""",
    doc="Stream-stream self-join: the purchases stream joins the clicks "
    "stream on user_id within a 1-hour event-time window, watermarks on "
    "BOTH sides bounding the join state (each side keeps only rows newer "
    "than watermark - interval; eviction follows the time-bound condition). "
    "Drained with availableNow into a memory sink; the single-batch drain "
    "makes the result equal the batch range join, so the oracle is plain "
    "SQL.  The per-user pair count is aggregated from the sink table.",
)
def st02(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events_stream(spark, sf)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", F.col("user_id").alias("p_user"), "ts")
        .withWatermark("ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr("c_user = p_user AND cts BETWEEN ts - INTERVAL 1 HOUR AND ts"),
        "inner",
    )
    return (
        _drain_to_memory(spark, joined, "append", "st02")
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@query(
    "st03_stream_dedup",
    """SELECT event_type, count(*) AS n FROM events
       GROUP BY event_type ORDER BY event_type""",
    doc="Streaming exact dedup with bounded state: the events stream unioned "
    "with itself (every record arrives twice) flows through "
    "dropDuplicatesWithinWatermark(event_id) — one state-store entry per id "
    "inside the watermark horizon, evicted as event time passes.  The "
    "deduplicated stream drains into a memory sink and aggregates to "
    "per-type counts, which must equal the plain per-type counts of the "
    "un-duplicated table — the SQL oracle.",
)
def st03(spark: SparkSession, sf: str) -> DataFrame:
    def stream():
        return _events_stream(spark, sf).select("event_id", "ts", "event_type")

    doubled = stream().unionByName(stream())
    deduped = doubled.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        _drain_to_memory(spark, deduped, "append", "st03")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "st04_stream_session",
    """WITH m AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ),
       s AS (
         SELECT user_id, ts, value,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess
         FROM m
       )
       SELECT user_id,
              strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
              strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
              count(*) AS n_events,
              sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sv
       FROM s GROUP BY user_id, sess
       ORDER BY user_id, session_start""",
    doc="Session-window streaming aggregation (dynamic-gap windows — state "
    "per open session, merged as events arrive) through a real "
    "readStream→writeStream drain, checked against the batch gaps-and-"
    "islands SQL: a session breaks when consecutive events are >= gap "
    "apart, and the window end is last-event + gap (Spark session_window "
    "end-exclusive semantics).",
)
def st04(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.events import session_windows_batch

    stream = _events_stream(spark, sf)
    # complete mode: no watermark needed
    sink = _drain_to_memory(spark, session_windows_batch(stream), "complete", "st04")
    return sink.orderBy("user_id", "session_start")


@query(
    "st05_stateful_totals",
    """SELECT user_id, count(*) AS n_events, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
       FROM events GROUP BY user_id ORDER BY user_id""",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running (count, sum) state updated by arbitrary Python logic, "
    "emitted in update mode each micro-batch.  The final update per user — "
    "selected with max_by on the monotone event count — must equal the batch "
    "aggregate, which is the SQL oracle.  This is the escape hatch for "
    "operators Spark's built-ins can't express: state lives in the state "
    "store partitioned by the groupBy hash shuffle, so it scales "
    "horizontally with executors.",
)
def st05(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.events import running_user_totals

    stream = _events_stream(spark, sf)
    sink = _drain_to_memory(spark, running_user_totals(stream), "update", "st05")
    # Update mode appends one row per (user, micro-batch with data for that
    # user); n_events strictly increases across a user's emissions, so the
    # final state is the max_by row.
    return (
        sink
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(total_value, n_events)").alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "st06_stream_sliding",
    """SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
              event_type, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sv
       FROM (SELECT event_type, value,
                    date_trunc('hour', ts) - to_hours(k) AS ws
             FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k))
       GROUP BY ws, event_type ORDER BY 1, 2""",
    doc="Sliding-window streaming aggregation (2-hour windows, 1-hour "
    "slide): every event lands in exactly two overlapping windows.  The "
    "oracle replicates each event into its two epoch-aligned window starts "
    "(hour(ts) and hour(ts) - 1h) and aggregates — Spark's window() with "
    "slide < width does the same replication inside codegen.  State is "
    "(window, event_type)-partitioned; the watermark closes windows.",
)
def st06(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.events import sliding_window_value

    stream = _events_stream(spark, sf)
    sink = _drain_to_memory(spark, sliding_window_value(stream), "complete", "st06")
    return sink.orderBy("window_start", "event_type")


@query(
    "st07_stream_static_join",
    """SELECT c.c_mktsegment AS segment, count(*) AS n_events,
              sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS total_value
       FROM events e JOIN customer c ON c.c_custkey = e.user_id
       GROUP BY 1 ORDER BY 1""",
    doc="Stream-static enrichment join run as a real readStream pipeline: "
    "the event stream joins a STATIC broadcast customer dimension (the "
    "stateless stream-static join Structured Streaming guarantees), then "
    "aggregates per market segment in complete mode.  availableNow drains "
    "the whole input in one micro-batch, so the result equals the batch "
    "join+aggregate and the DuckDB oracle checks it exactly.",
)
def st07(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.events import enriched_segment_totals
    from ..tables import load_table

    stream = _events_stream(spark, sf)
    customers = load_table(spark, sf, "customer")
    sink = _drain_to_memory(spark, enriched_segment_totals(stream, customers), "complete", "st07")
    return sink.select(
        "segment", "n_events", "total_value"
    ).orderBy("segment")


@query(
    "st08_stream_ingest_dedup",
    """WITH seen AS (SELECT DISTINCT md5(concat_ws('|', user_id, event_type, props)) AS h
                     FROM events WHERE event_id % 3 = 0),
        s AS (SELECT event_type, value,
                     md5(concat_ws('|', user_id, event_type, props)) AS h
              FROM events)
       SELECT event_type, count(*) AS n_new, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
       FROM s WHERE h NOT IN (SELECT h FROM seen)
       GROUP BY 1 ORDER BY 1""",
    doc="Streaming ingest dedup (the streaming twin of d09): the event "
    "stream anti-joins a STATIC already-ingested content-hash index "
    "(every third event stands in for the existing corpus), so only "
    "genuinely novel content reaches the per-type aggregate.  The "
    "stream-static LEFT ANTI join is stateless — each micro-batch probes "
    "the broadcast index, no state store — and availableNow drains the "
    "file stream in one batch so the DuckDB oracle checks it exactly.",
)
def st08(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.events import content_hash, novel_event_totals
    from ..tables import load_table

    stream = _events_stream(spark, sf)
    seen = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select(content_hash().alias("h"))
        .distinct()
    )
    sink = _drain_to_memory(spark, novel_event_totals(stream, seen), "complete", "st08")
    return sink.select("event_type", "n_new", "total_value").orderBy("event_type")


@query(
    "st09_late_data_drop",
    """WITH b AS (SELECT max(ts) - INTERVAL 150 MINUTE AS wm,
                         min(ts) + INTERVAL 24 HOUR AS day_end
                  FROM events),
        agg AS (SELECT date_trunc('hour', ts) AS ws, count(*) AS cnt
                FROM events, b
                WHERE NOT (ts < b.day_end AND event_id % 2 = 0)
                GROUP BY 1)
       SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start,
              CAST(cnt AS BIGINT) AS cnt
       FROM agg, b
       WHERE ws + INTERVAL 1 HOUR <= b.wm
       ORDER BY window_start""",
    doc="Watermark LATE-DATA DROP, actually witnessed: every other st* "
    "query drains availableNow in one micro-batch, where the watermark "
    "never advances mid-run and therefore never drops anything.  Here the "
    "events table is re-staged as four files with controlled arrival "
    "order (mtime-ordered, maxFilesPerTrigger=1): day-1 odd-id events, "
    "the rest of the month, an EMPTY watermark-propagation file, then the "
    "day-1 even-id events arriving LAST — a month late.  The append-mode "
    "tumbling aggregation must (a) drop every late row (their windows "
    "closed when the watermark reached month-end minus 2h30m) and (b) "
    "emit exactly the windows whose end precedes the final watermark.  "
    "The DuckDB oracle replicates both rules arithmetically.  The empty "
    "third file matters: Spark's late-input filter runs on the watermark "
    "PLANNED for the batch, which lags the state-eviction watermark by "
    "one micro-batch (measured on 4.1: late rows landing in still-open "
    "windows in the batch right after the advance are MERGED, not "
    "dropped); the no-data batch lets the advanced watermark reach the "
    "filter before the late file arrives, making the drop deterministic.",
)
def st09(spark: SparkSession, sf: str) -> DataFrame:
    """Late-data drop through a real multi-batch file stream.

    Staging writes go to a per-(sf,pid) temp dir — harness plumbing, like
    the memory sink; the operator under test is the streaming plan.  The
    150-minute delay is deliberately NOT a whole hour: the final
    watermark (max ts - 2h30m) lands on an hour-window boundary only if
    max(ts) falls exactly on minute 30 with zero seconds/micros — the
    event timestamps are microsecond-random, so the <= in the oracle's
    emitted-window cutoff never has to agree with Spark's eviction
    strictness on an exact tie.  (Data-dependent, not structural: if a
    future testdata generation pins max(ts) to a half-hour, revisit the
    delay before trusting a red hash.)"""
    import datetime
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile

    from ..tables import load_table

    ev = load_table(spark, sf, "events")
    t0 = ev.agg(F.min("ts").alias("t0")).collect()[0]["t0"]
    day_end = t0 + datetime.timedelta(hours=24)
    is_day1 = F.col("ts") < F.lit(day_end)
    is_late = is_day1 & (F.col("event_id") % 2 == 0)

    key = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"disq_st09_{key}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    ev.filter(is_day1 & (F.col("event_id") % 2 != 0)).repartition(1).write.parquet(
        base + "/b1"
    )
    ev.filter(~is_day1).repartition(1).write.parquet(base + "/b2")
    ev.filter(F.lit(False)).repartition(1).write.parquet(base + "/b3")
    ev.filter(is_late).repartition(1).write.parquet(base + "/b4")
    for i, d in enumerate(("b1", "b2", "b3", "b4"), 1):
        for f in _glob.glob(f"{base}/{d}/*.parquet"):
            os.utime(f, (1_000_000 + 1_000 * i,) * 2)

    try:
        schema = spark.read.parquet(base + "/b1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(base + "/b*")
        )
        agg = (
            stream.withWatermark("ts", "150 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                    "window_start"
                ),
                "cnt",
            )
        )
        sink = _drain_to_memory(spark, agg, "append", "st09")
        return sink.orderBy("window_start")
    finally:
        # The memory sink holds the drained rows; the staged copies of the
        # events table are dead weight after the drain — remove them so
        # repeated bench/driver runs don't accumulate copies in the system
        # temp dir (ADVICE r9).
        shutil.rmtree(base, ignore_errors=True)

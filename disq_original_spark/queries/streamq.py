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

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events import windowed_counts
from .registry import query

_SINK_IDS = itertools.count()


@query(
    "st01_stream_tumbling",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
              event_type, count(*) AS cnt, round(sum(value), 2) AS sv
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Tumbling-window streaming aggregation run through a real "
    "readStream→writeStream pipeline (availableNow trigger, memory sink) "
    "and checked against the batch SQL oracle — the streaming/batch "
    "unification Structured Streaming promises, made a test contract.",
)
def st01(spark: SparkSession, sf: str) -> DataFrame:
    path = f"{sf}/events.parquet"
    # Same TIMESTAMP(NANOS) handling as tables.load_table: nanos→long at the
    # scan, truncate to micros (what DuckDB stores) before event-time ops.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        # FileStreamSource insists the source path be a directory; a glob
        # that resolves to the single file satisfies it (basePath = parent).
        .parquet(f"{sf}/events.*")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    name = f"st01_sink_{next(_SINK_IDS)}"
    q = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.table(name).orderBy("window_start", "event_type")

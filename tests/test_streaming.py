"""Structured Streaming operators checked against batch-computed expectations
(availableNow trigger over a file stream of the events table)."""

from __future__ import annotations

import pytest

from disq_original_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_within_watermark,
    windowed_counts,
    windowed_counts_batch,
)
from disq_original_spark.tables import load_table


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events table written as a streaming-readable parquet dir with
    micro-second timestamps."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_to_memory(spark, windowed_counts(stream), "win_counts", "append").collect()
    events = load_table(spark, sf_dir, "events")
    expected = windowed_counts_batch(events).collect()
    # Append mode only emits windows finalized by the watermark: windows whose
    # end is past max(ts) - 2h stay in state when the availableNow run ends.
    import datetime as dt

    max_ts = events.agg({"ts": "max"}).collect()[0][0]
    cutoff = max_ts - dt.timedelta(hours=2) - dt.timedelta(hours=1)  # window end ≤ watermark
    finalized = [
        r
        for r in expected
        if dt.datetime.strptime(r["window_start"], "%Y-%m-%d %H:%M") <= cutoff
    ]
    got_set = set(map(str, got))
    assert got_set.issuperset(set(map(str, finalized)))
    assert got_set.issubset(set(map(str, expected)))
    assert len(got) > 0


def test_dedup_within_watermark(spark, events_dir):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_to_memory(spark, dedup_within_watermark(stream), "dedup_stream", "append")
    base = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    assert got.count() == base.select("event_id").distinct().count()


def test_session_windows_match_batch(spark, sf_dir, events_dir):
    from disq_original_spark.streaming.events import (
        session_windows,
        session_windows_batch,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_to_memory(spark, session_windows(stream), "sess_win", "append").collect()
    expected = session_windows_batch(load_table(spark, sf_dir, "events")).collect()
    got_set, exp_set = set(map(str, got)), set(map(str, expected))
    # append emits only watermark-closed sessions; all emitted must be exact
    assert got_set.issubset(exp_set)
    assert len(got) > 0


def test_running_user_totals_stateful(spark, sf_dir, events_dir):
    from disq_original_spark.streaming.events import (
        running_user_totals,
        running_user_totals_batch,
    )

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_to_memory(spark, running_user_totals(stream), "user_totals", "update")
    # last update per user == batch-computed totals
    import pandas as pd

    gpdf = got.toPandas()
    final = gpdf.groupby("user_id").last().reset_index()
    expected = (
        running_user_totals_batch(load_table(spark, sf_dir, "events"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    final = final.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(final[["user_id", "n_events", "total_value"]],
                                  expected, check_dtype=False)


def test_stream_static_join_matches_batch(spark, sf_dir, events_dir):
    from disq_original_spark.streaming.events import (
        enriched_segment_totals,
        enriched_segment_totals_batch,
    )

    customers = load_table(spark, sf_dir, "customer")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    got = _run_to_memory(
        spark, enriched_segment_totals(stream, customers), "seg_totals", "complete"
    ).collect()
    expected = enriched_segment_totals_batch(
        load_table(spark, sf_dir, "events"), customers
    ).collect()
    assert set(map(str, got)) == set(map(str, expected))
    assert len(got) > 0


def test_stateful_totals_across_multiple_microbatches(spark, sf_dir, tmp_path):
    """State must SURVIVE micro-batch boundaries: the events table split
    into 8 files, drained 2 files per trigger (4+ real micro-batches), must
    produce the same final per-user totals as the batch aggregate — this is
    the state-store contract a single availableNow batch never exercises."""
    import pyspark.sql.functions as F

    from disq_original_spark.streaming.events import (
        running_user_totals,
        running_user_totals_batch,
    )

    d = str(tmp_path / "ev8")
    load_table(spark, sf_dir, "events").repartition(8).write.parquet(d)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(d)
    )
    sink = _run_to_memory(spark, running_user_totals(stream), "multi_batch_totals", "update")
    got = (
        sink.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(total_value, n_events)").alias("total_value"),
        )
        .collect()
    )
    expected = running_user_totals_batch(load_table(spark, sf_dir, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    # and it genuinely ran as several micro-batches, not one: update mode
    # emits one row per (user, batch-with-data), so multi-batch => more
    # update rows than users
    assert sink.count() > len(expected)


def test_windowed_counts_complete_mode_across_microbatches(spark, sf_dir, tmp_path):
    """Complete-mode windowed aggregation over 4+ micro-batches (files
    arriving in arbitrary order) must equal the batch twin — no state loss,
    no premature eviction."""
    from disq_original_spark.streaming.events import (
        windowed_counts,
        windowed_counts_batch,
    )

    d = str(tmp_path / "ev8w")
    load_table(spark, sf_dir, "events").repartition(8).write.parquet(d)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(d)
    )
    got = _run_to_memory(
        spark, windowed_counts(stream), "multi_batch_windows", "complete"
    ).collect()
    expected = windowed_counts_batch(load_table(spark, sf_dir, "events")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_st09_late_rows_are_really_dropped(spark, sf_dir):
    """The st09 witness must differ from the drop-nothing world: recompute
    the same windowed counts WITH the late (day-1 even-id) rows included —
    if the streaming result matched it, the watermark dropped nothing and
    the query is vacuous.  Also: the drain must have run as >= 4 real
    micro-batches (1 file each), or no watermark ever advanced mid-run."""
    import datetime

    import pyspark.sql.functions as F

    from disq_original_spark.queries import QUERIES

    got = {
        r["window_start"]: r["cnt"]
        for r in QUERIES["st09_late_data_drop"].build(spark, sf_dir).collect()
    }
    assert got, "st09 emitted nothing"
    ev = load_table(spark, sf_dir, "events")
    t0, tmax = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    wm = tmax - datetime.timedelta(minutes=150)
    all_counts = {
        r["window_start"]: r["cnt"]
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "cnt",
        )
        .collect()
        if r["window_start"] <= wm.strftime("%Y-%m-%d %H:%M")
    }
    # late rows exist at every sf (half of day 1), so the two must differ
    assert got != all_counts, "watermark dropped nothing — vacuous witness"
    # and the drop is exactly the late set: every emitted window's count is
    # <= the all-rows count, strictly < for at least one day-1 window
    assert all(got[k] <= all_counts.get(k, 0) for k in got)
    assert any(got[k] < all_counts[k] for k in got if k in all_counts)

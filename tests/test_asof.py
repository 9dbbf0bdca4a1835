"""Unit semantics for operators/asof.py (q34's oracle covers the big case)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from disq_original_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # after r2 → matches r2
            (2, 10, _ts("2024-01-01 09:00:00")),  # equal ts → matches r1
            (3, 10, _ts("2024-01-01 08:00:00")),  # before all → null
            (4, 20, _ts("2024-01-01 10:00:00")),  # key with no right rows
        ],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01 09:00:00"), "r1"),
            (102, 10, _ts("2024-01-01 09:30:00"), "r2"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    return left, right


def test_asof_backward_equal_ts_and_miss(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    tiebreak="rid")
    rows = {r["lid"]: (r["rid"], r["tag"]) for r in out.collect()}
    assert rows[1] == (102, "r2")
    assert rows[2] == (101, "r1")  # equal-ts right row matches (>= contract)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)


def test_asof_equal_ts_tie_takes_greatest_tiebreak(spark):
    left, _ = _frames(spark)
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01 09:00:00"), "lo"),
            (109, 10, _ts("2024-01-01 09:00:00"), "hi"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    tiebreak="rid")
    rows = {r["lid"]: r["rid"] for r in out.collect()}
    assert rows[1] == 109 and rows[2] == 109


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    tiebreak="rid", tolerance="10 minutes")
    rows = {r["lid"]: r["rid"] for r in out.collect()}
    assert rows[1] is None  # r2 is 30 min stale
    assert rows[2] == 101   # equal ts → 0 lag, within tolerance


def test_asof_plan_has_no_join(spark):
    from disq_original_spark.plans import simple_plan

    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")
    plan = simple_plan(out)
    assert "Join" not in plan  # union + one window pass, never a join
    assert "Window" in plan


def test_asof_string_tiebreak_is_deterministic(spark):
    left, _ = _frames(spark)
    right = spark.createDataFrame(
        [
            (101, 10, _ts("2024-01-01 09:00:00"), "aaa"),
            (109, 10, _ts("2024-01-01 09:00:00"), "zzz"),
        ],
        "rid long, k long, rts timestamp, tag string",
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    tiebreak="tag")
    rows = {r["lid"]: r["tag"] for r in out.collect()}
    assert rows[1] == "zzz" and rows[2] == "zzz"  # greatest tag wins


def test_asof_duplicate_output_columns_rejected(spark):
    import pytest

    left, _ = _frames(spark)
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:00:00"), 7)], "k long, rts timestamp, lid long"
    )  # 'lid' clashes with the left side
    with pytest.raises(ValueError, match="duplicate columns"):
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts")

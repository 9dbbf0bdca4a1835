"""Binned interval join (operators/interval.py::interval_join bin_size path):
equivalence with the naive range join and the plan contract that justifies it."""

from __future__ import annotations

from pyspark.sql import functions as F

from disq_original_spark.operators.interval import interval_join
from disq_original_spark.plans import simple_plan
from disq_original_spark.queries import QUERIES
from disq_original_spark.tables import load_table


def _sides(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("e"),
    )
    right = iv.select(
        F.col("event_id").alias("b_event_id"),
        F.col("event_type").alias("b_event_type"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
    )
    return iv, right


def _pairs(df):
    return sorted(
        (r["event_id"], r["b_event_id"])
        for r in df.select("event_id", "b_event_id").collect()
    )


def test_binned_equals_naive_range_join(spark, sf_dir):
    iv, right = _sides(spark, sf_dir)
    kw = dict(
        on_contig=("event_type", "b_event_type"),
        left_span=("s", "e"),
        right_span=("b_s", "b_e"),
    )
    naive = interval_join(iv, right, **kw).filter(
        F.col("event_id") < F.col("b_event_id")
    )
    # Bin smaller than the span (each interval touches several bins) to
    # exercise the first-shared-bin dedup, and larger, to exercise ≤2 bins.
    for bin_size in (250_000_000, 3_600_000_000):
        binned = interval_join(iv, right, bin_size=bin_size, **kw).filter(
            F.col("event_id") < F.col("b_event_id")
        )
        assert _pairs(binned) == _pairs(naive), bin_size


def test_g05_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    df = QUERIES["g05_binned_interval_join"].build(spark, sf_dir)
    plan = simple_plan(df)
    assert "NestedLoop" not in plan  # binning makes it a hash/merge equi-join
    assert "Join" in plan


def test_salted_join_handles_map_columns(spark):
    """The salt hash must skip Map-typed columns (hash() rejects MapType);
    reads/variants schemas carry attribute maps, the operator's documented
    workload."""
    import pyspark.sql.functions as F

    from disq_original_spark.operators.interval import interval_join

    left = spark.createDataFrame(
        [("c1", 10, 20, {"NM": "1"}), ("c1", 10, 20, {"NM": "2"}), ("c1", 300, 400, {})],
        "contig string, start long, end long, attributes map<string,string>",
    )
    right = spark.createDataFrame(
        [("c1", 15, 18), ("c1", 350, 360)], "contig string, start long, end long"
    )
    out = interval_join(
        left, right, ("contig", "contig"), ("start", "end"), ("start", "end"),
        bin_size=100, salt=4,
    )
    assert out.count() == 3  # two map-rows overlap the first span, one the second

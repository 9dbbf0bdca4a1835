"""Sketch/synopsis surface: the approximate structures a 100 TB pipeline
leans on when exact answers stop being affordable — each checked against
the exact computation at test scale.

- approx_count_distinct (HLL++) is oracle-checked in q12 (±5%).
- approx_percentile: bounded-error quantiles (the scale path of q32's
  exact percentiles).
- hll_sketch_agg / hll_union / hll_sketch_estimate (Apache DataSketches):
  MERGEABLE distinct-count sketches — partial sketches built per
  partition/day and unioned later, the pattern that replaces global
  count-distinct at scale.
- freqItems: heavy-hitter superset with a support threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from disq_original_spark.tables import load_table


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"),
    ).collect()[0]
    for approx, exact in zip(row["ap"], row["ex"]):
        assert abs(approx - exact) / exact < 0.05


def test_hll_sketch_estimate_and_mergeability(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select("l_partkey").distinct().count()
    est = li.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").alias("e")
    ).collect()[0]["e"]
    assert abs(est - exact) / exact < 0.05

    # Mergeability: per-shard sketches unioned == one global sketch's answer
    # (the whole point — shards/days aggregate without re-scanning).
    shards = li.withColumn("shard", F.col("l_orderkey") % 4)
    merged = (
        shards.groupBy("shard")
        .agg(F.expr("hll_sketch_agg(l_partkey)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("e"))
        .collect()[0]["e"]
    )
    assert merged == est


def test_freq_items_superset_guarantee(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    exact_frequent = {
        r["l_returnflag"]
        for r in li.groupBy("l_returnflag").count().collect()
        if r["count"] / total >= 0.25
    }
    got = set(
        li.stat.freqItems(["l_returnflag"], support=0.25).collect()[0][
            "l_returnflag_freqItems"
        ]
    )
    assert exact_frequent <= got  # superset guarantee

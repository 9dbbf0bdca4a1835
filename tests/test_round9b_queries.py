"""Semantic invariants for q53/q54/q55 (the round-9 TPC-H Q17/Q20/Q15
shapes) beyond their DuckDB differential checks: brute-force re-derivation
of each threshold set through an independent plan path, completeness of
the HAVING cut (both directions), and tie semantics on the global max.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from disq_original_spark.queries import QUERIES
from disq_original_spark.queries.relational import _Q54_QTY_CUT
from disq_original_spark.tables import load_table


def test_q53_matches_correlated_subquery_form(spark, sf_dir):
    """The decorrelated pre-aggregate plan must equal the literal
    correlated-scalar-subquery SQL (a DIFFERENT Catalyst path: Spark's
    own decorrelation instead of the hand-written join)."""
    row = QUERIES["q53_tpch_q17"].build(spark, sf_dir).collect()[0]
    assert row["n_small"] > 0 and row["revenue_cents"] > 0
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("t53_li")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("t53_part")
    ref = spark.sql(
        """SELECT count(*) AS n_small,
                  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS revenue_cents
           FROM t53_li l JOIN t53_part ON p_partkey = l_partkey
           WHERE p_type = 'PROMO'
             AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                               FROM t53_li l2
                               WHERE l2.l_partkey = l.l_partkey)"""
    ).collect()[0]
    assert (row["n_small"], row["revenue_cents"]) == (
        ref["n_small"],
        ref["revenue_cents"],
    )


def test_q54_having_cut_is_complete_both_directions(spark, sf_dir):
    """Every returned supplier's LARGE-part shipped quantity (recomputed
    from scratch) exceeds the cut, and every supplier NOT returned is at
    or under it — the semi-join drops nobody it shouldn't."""
    got = {r["s_suppkey"] for r in QUERIES["q54_tpch_q20"].build(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    large = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    qty = {
        r["l_suppkey"]: r["q"]
        for r in li.join(large, li.l_partkey == large.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .collect()
    }
    assert got, "q54 must keep a non-empty supplier set at every sf"
    expected = {k for k, v in qty.items() if v > _Q54_QTY_CUT}
    assert got == expected
    all_supp = {
        r["s_suppkey"] for r in load_table(spark, sf_dir, "supplier").collect()
    }
    assert got < all_supp, "the cut must actually exclude someone"


def test_q55_winners_are_exactly_the_argmax_ties(spark, sf_dir):
    rows = QUERIES["q55_tpch_q15"].build(spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem")
    rev = {
        r["l_suppkey"]: r["c"]
        for r in li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            ).alias("c")
        )
        .collect()
    }
    m = max(rev.values())
    assert {r["s_suppkey"] for r in rows} == {k for k, v in rev.items() if v == m}
    assert all(r["total_cents"] == m for r in rows)

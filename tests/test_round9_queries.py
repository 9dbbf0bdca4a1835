"""Semantic invariants for the round-9 queries (q51/q52/d15/p13) beyond
their DuckDB differential checks: cross-query consistency (containment
dominates Jaccard on shared pairs), conservation laws (distribution sums
to the customer count; phases partition the corpus), and the boundary
arithmetic the oracles alone can't falsify.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from disq_original_spark.queries import QUERIES
from disq_original_spark.queries.dedup import _D15_MILLI
from disq_original_spark.queries.packing import _P13_PHASES
from disq_original_spark.tables import load_table


def test_q51_distribution_sums_to_customer_count(spark, sf_dir):
    rows = QUERIES["q51_tpch_q13"].build(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    # bins are distinct and non-negative counts
    bins = [r["c_count"] for r in rows]
    assert len(bins) == len(set(bins)) and min(bins) >= 0


def test_q52_candidates_subset_of_pool(spark, sf_dir):
    from disq_original_spark.queries.relational import _Q52_NATIONS

    rows = QUERIES["q52_tpch_q22"].build(spark, sf_dir).collect()
    assert rows, "q52 must select a non-empty survivor set at every sf"
    assert {r["cntrycode"] for r in rows} <= set(_Q52_NATIONS)
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*_Q52_NATIONS))
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    per_nation = {r["c_nationkey"]: r["count"] for r in pool}
    for r in rows:
        assert 0 < r["numcust"] <= per_nation[r["cntrycode"]]


def test_d15_containment_dominates_jaccard(spark, sf_dir):
    """C(pair) >= J(pair) pointwise (|∩|/min >= |∩|/|∪|), so every d04
    pair at threshold tau must appear in d15 at milli(tau) — and on
    SHARED pairs the containment value must be >= the Jaccard value."""
    d15 = {
        (r["a_id"], r["b_id"]): r["cont_milli"]
        for r in QUERIES["d15_containment_neardup"].build(spark, sf_dir).collect()
    }
    d04 = {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in QUERIES["d04_ngram_jaccard"].build(spark, sf_dir).collect()
    }
    # d04's threshold is 0.4; 0.4 in milli = 400 < _D15_MILLI=600, so only
    # d04 pairs with jac >= 0.6 are guaranteed present in d15
    for pair, jac in d04.items():
        if jac >= (_D15_MILLI + 1) / 1000:  # clear of the rounding boundary
            assert pair in d15, (pair, jac)
        if pair in d15:
            # containment (milli, half-up) dominates jaccard (3dp round)
            assert d15[pair] >= int(jac * 1000) - 1, (pair, d15[pair], jac)


def test_d15_contained_id_is_smaller_side(spark, sf_dir):
    rows = QUERIES["d15_containment_neardup"].build(spark, sf_dir).collect()
    assert rows, "d15 must flag pairs at every shipped sf"
    for r in rows:
        assert r["contained_id"] in (r["a_id"], r["b_id"])
        assert _D15_MILLI <= r["cont_milli"] <= 1000


def test_p13_phases_partition_the_budget(spark, sf_dir):
    rows = QUERIES["p13_curriculum_phases"].build(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs  # every document gets exactly one phase
    total = sum(r["n_tokens"] for r in rows)
    assert max(r["cum_tokens"] for r in rows) == total
    # the running sum is consistent: sorting by (n_tokens, doc_id) must
    # reproduce cum_tokens as the prefix sum — the distributed two-level
    # computation equals the sequential definition
    seq = sorted(rows, key=lambda r: (r["n_tokens"], r["doc_id"]))
    run = 0
    for r in seq:
        run += r["n_tokens"]
        assert r["cum_tokens"] == run, (r["doc_id"], r["cum_tokens"], run)
    # phase = floor(exclusive_cum * P / total), capped at P-1
    for r in seq:
        want = min((r["cum_tokens"] - r["n_tokens"]) * _P13_PHASES // total,
                   _P13_PHASES - 1)
        assert r["phase"] == want
    # all phases are populated and ordered with the curriculum
    assert {r["phase"] for r in rows} == set(range(_P13_PHASES))
    phases = [r["phase"] for r in seq]
    assert phases == sorted(phases)

"""Alternating large-star/small-star connected components (operators/graph):
exact labels vs a union-find oracle, O(log n) round count on a deliberately
chained path graph (the case that kills min-label propagation), and the
loud-failure contract when the round cap is hit."""

from __future__ import annotations

import random

import pytest

from disq_original_spark.operators.graph import connected_components


def _union_find_labels(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    labels, rounds = connected_components(df, **kw)
    got = {r["node"]: r["label"] for r in labels.collect()}
    return got, rounds


def test_path_graph_converges_in_log_rounds(spark):
    """A 1000-node chain has diameter 999: min-label propagation needs ~999
    rounds, large-star/small-star must finish in ~log2(1000) ≈ 10."""
    pairs = [(i, i + 1) for i in range(999)]
    got, rounds = _run(spark, pairs)
    assert rounds <= 12, rounds
    assert got == {i: 0 for i in range(1000)}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 200
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(120 + 40 * trial)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        got, _rounds = _run(spark, pairs)
        assert got == _union_find_labels(pairs)


def test_star_and_duplicate_edges(spark):
    """Pre-starred input is a fixed point in one round; duplicate and
    reversed edges must not change labels."""
    pairs = [(0, i) for i in range(1, 20)] + [(i, 0) for i in range(1, 20)]
    got, rounds = _run(spark, pairs + pairs)
    assert rounds == 1
    assert got == {i: 0 for i in range(20)}


def test_unconverged_raises_loud(spark):
    pairs = [(i, i + 1) for i in range(63)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            spark.createDataFrame(pairs, "a_id long, b_id long"), max_iters=1
        )[0].collect()

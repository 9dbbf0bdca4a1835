"""coverage_gini run-length math: exact parity with a per-base brute
force on synthetic span tables (overlap stacking, interior zero-gaps,
multi-contig, randomized), uniformity ⇒ Gini 0, and the aligned-span
fold's reuse contract.  Whole-fixture oracle parity for g27 runs in
tests/test_oracle.py."""

from __future__ import annotations

import random

from disq_original_spark.operators.coverage import coverage_gini
from disq_original_spark.queries import QUERIES


def _brute(spans):
    """Per-base reference: explode every span, then the Gini identity
    G = (2·Σ i·xᵢ − (N+1)·Σ x) / (N·Σ x) over the sorted depth multiset."""
    depth: dict = {}
    for rname, s, e in spans:
        for p in range(s, e + 1):
            depth[(rname, p)] = depth.get((rname, p), 0) + 1
    out = {}
    for rname in sorted({r for r, _ in depth}):
        xs = sorted(v for (r, _), v in depth.items() if r == rname)
        n, tot = len(xs), sum(xs)
        num = 2 * sum(i * x for i, x in enumerate(xs, 1)) - (n + 1) * tot
        out[rname] = (n, tot, max(xs), num, n * tot)
    return out


def _run(spark, spans):
    df = spark.createDataFrame(spans, "rname string, s long, e long")
    return {
        r["rname"]: (
            r["n_covered"], r["total_depth"], r["max_depth"],
            r["gini_num"], r["gini_den"],
        )
        for r in coverage_gini(df).collect()
    }


def test_uniform_coverage_is_zero_gini(spark):
    # two disjoint runs at identical depth 2 — perfectly even
    spans = [("c", 10, 20), ("c", 10, 20), ("c", 50, 60), ("c", 50, 60)]
    got = _run(spark, spans)
    assert got == _brute(spans)
    assert got["c"][3] == 0  # gini_num


def test_overlap_stacking_and_gaps(spark):
    spans = [
        ("c", 1, 100), ("c", 50, 150), ("c", 90, 95),  # pileup to 3
        ("c", 500, 510),                                # interior zero-gap
        ("d", 7, 7),                                    # 1-base contig
    ]
    assert _run(spark, spans) == _brute(spans)


def test_randomized_spans_match_bruteforce(spark):
    rng = random.Random(11)
    spans = []
    for _ in range(120):
        rname = rng.choice(["c1", "c2"])
        s = rng.randrange(1, 400)
        spans.append((rname, s, s + rng.randrange(0, 60)))
    got = _run(spark, spans)
    want = _brute(spans)
    assert got == want
    # sanity: randomized pileup is NOT uniform — the metric discriminates
    assert any(v[3] > 0 for v in got.values())


def test_bigint_headroom_guard_fails_loud(spark):
    """The run-length representation makes covered-base count independent
    of row count (one genome-length span = 2 event rows), so BIGINT
    overflow of the exact Gini products is a data property the plan must
    detect at RUNTIME (VERDICT r6 directive #5, the t17 lesson).  A
    synthetic 3 Gbp span — 2·1·3e9·(3e9+1) ≈ 1.8e19 > 2^63 — must raise
    the named headroom error, not overflow or return garbage."""
    import pytest

    df = spark.createDataFrame(
        [("chr_huge", 1, 3_000_000_000)], "rname string, s long, e long"
    )
    with pytest.raises(Exception, match="BIGINT headroom"):
        coverage_gini(df).collect()


def test_bigint_headroom_guard_admits_safe_giants(spark):
    """Just-under-bound contigs still compute exactly: 1 Gbp at depth ≤ 2
    keeps 2·max_depth·N·(N+1) ≈ 8e18... over 4e18 — use 500 Mbp at depth
    2 (2·2·5e8·(5e8+1) = 1e18 < 4e18), verified against the closed form
    for a two-level depth profile."""
    n = 500_000_000
    df = spark.createDataFrame(
        [("c", 1, n), ("c", 1, n // 2)], "rname string, s long, e long"
    )
    row = coverage_gini(df).collect()[0]
    # depth profile: n/2 bases at depth 2, n/2 at depth 1 (run-length —
    # no per-base work).  Closed form of the Gini identity:
    half, tot = n // 2, n + n // 2
    ranksum_d1 = half * (half + 1) // 2
    ranksum_d2 = (n * (n + 1) - half * (half + 1)) // 2
    num = 2 * (1 * ranksum_d1 + 2 * ranksum_d2) - (n + 1) * tot
    assert (row["n_covered"], row["total_depth"], row["max_depth"]) == (n, tot, 2)
    assert (row["gini_num"], row["gini_den"]) == (num, n * tot)


def test_g27_uses_shared_span_fold(spark):
    """g13 and g27 must walk CIGARs through the one shared fold — the
    Python twin in tools/build_oracle_fixtures.py mirrors exactly one
    implementation."""
    import inspect

    import disq_original_spark.queries.genomic as g

    src13 = inspect.getsource(g.g13)
    src27 = inspect.getsource(g.g27)
    assert "aligned_spans_expr" in src13 and "aligned_spans_expr" in src27

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
            # gini_num/gini_den travel as exact digit STRINGs (ADVICE r8)
            int(r["gini_num"]), int(r["gini_den"]),
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


def test_full_genome_gini_computes_exactly(spark):
    """VERDICT r7 directive #6: a full-genome 3 Gbp contig COMPUTES the
    exact closed-form Gini instead of raising — the products live in
    DECIMAL(38,0) (gini_den = 3e9·4.5e9 = 1.35e19 > 2^63, so BIGINT
    could not even carry the OUTPUT).  Two-level depth profile (run-
    length — no per-base work): n/2 bases at depth 2, n/2 at depth 1."""
    n = 3_000_000_000
    df = spark.createDataFrame(
        [("chr_huge", 1, n), ("chr_huge", 1, n // 2)],
        "rname string, s long, e long",
    )
    out = coverage_gini(df)
    # contract pin (ADVICE r8): the pair travels as STRING — decimal
    # output breaks the cross-engine hash witness (DuckDB pandas fetch
    # renders DECIMAL(38,0) as float64), the digit string never does
    assert dict(out.dtypes)["gini_num"] == "string"
    assert dict(out.dtypes)["gini_den"] == "string"
    row = out.collect()[0]
    half, tot = n // 2, n + n // 2
    ranksum_d1 = half * (half + 1) // 2
    ranksum_d2 = (n * (n + 1) - half * (half + 1)) // 2
    num = 2 * (1 * ranksum_d1 + 2 * ranksum_d2) - (n + 1) * tot
    assert (row["n_covered"], row["total_depth"], row["max_depth"]) == (n, tot, 2)
    assert (int(row["gini_num"]), int(row["gini_den"])) == (num, n * tot)
    assert num > 2**63 or n * tot > 2**63  # the case BIGINT could not hold


def test_decimal_headroom_guard_fails_loud(spark):
    """The run-length representation makes covered-base count independent
    of row count (one genome-length span = 2 event rows), so overflow of
    the exact Gini products is a data property the plan must detect at
    RUNTIME (the t17 lesson).  With DECIMAL(38,0) arithmetic the bound is
    2·max_depth·N·(N+1) < 5e37 — unreachable by any physical genome but
    reachable through synthetic coordinates: one 5e18-base span gives
    2·1·5e18·(5e18+1) = 5e37, which must raise the NAMED headroom error,
    not ANSI's anonymous ARITHMETIC_OVERFLOW."""
    import pytest

    df = spark.createDataFrame(
        [("chr_synth", 1, 5_000_000_000_000_000_000)],
        "rname string, s long, e long",
    )
    with pytest.raises(Exception, match="DECIMAL.38,0. headroom"):
        coverage_gini(df).collect()


def test_bigint_total_depth_guard_fails_loud(spark):
    """r8 review finding: the widened decimal bound alone left the
    still-BIGINT total_depth column unprotected.  10,001 overlapping
    spans of 1e15 bases keep 2·d·N·(N+1) ≈ 2e34 far under 5e37 but put
    total_depth = d·N ≈ 1.0001e19 past 2^63 — must raise the NAMED
    headroom error, not ANSI's anonymous long-overflow."""
    import pytest

    n = 1_000_000_000_000_000
    df = spark.createDataFrame(
        [("chr_deep", 1, n)] * 10_001, "rname string, s long, e long"
    )
    with pytest.raises(Exception, match="DECIMAL.38,0. headroom"):
        coverage_gini(df).collect()


def test_g27_uses_shared_span_fold(spark):
    """g13 and g27 must walk CIGARs through the one shared fold — the
    Python twin in tools/build_oracle_fixtures.py mirrors exactly one
    implementation."""
    import inspect

    import disq_original_spark.queries.genomic as g

    src13 = inspect.getsource(g.g13)
    src27 = inspect.getsource(g.g27)
    assert "aligned_spans_expr" in src13 and "aligned_spans_expr" in src27

"""Depth-of-coverage operators over aligned-read span tables: the codegen
CIGAR→span fold shared by the depth queries, and run-length coverage
statistics (per-contig depth histogram + exact Gini uniformity) computed
WITHOUT per-base explosion.

Why run-length: ``samtools depth``-style per-base explode (g13) is the
right shape for a bounded region, but a whole-contig uniformity metric
over a 249 Mbp contig would materialize 2.5e8 rows per contig per metric.
The delta-event walk instead emits TWO rows per aligned span (+1 at s,
−1 at e+1), aggregates deltas per breakpoint, and reconstructs constant-
depth RUNS with one running-sum window per contig — O(spans), not
O(bases).  The Gini then needs only the (depth → covered-bases) histogram,
which is tiny (distinct depths per contig ≤ max pileup), and stays in
exact integer arithmetic end-to-end: the classic identity
G = (2·Σᵢ i·xᵢ − (N+1)·Σ xᵢ) / (N·Σ xᵢ) over the sorted per-base depth
multiset, with each equal-depth block's DOUBLED rank sum folded in
closed form (cum·(cum+1) − prev·(prev+1) — the 2· of the identity
absorbs the /2, so no division appears anywhere).  Emitting the
(numerator, denominator) PAIR keeps the result integer-exact
cross-engine; consumers divide.

Arithmetic width (VERDICT r7 directive #6): the run-length walk —
the part that scales with data — stays BIGINT (positions and per-run
base counts fit 2^63 for any genome).  Only the final per-(contig,
depth) histogram aggregate, whose row count is bounded by max pileup,
computes in DECIMAL(38,0): num ≤ 2·max_depth·N² is ~1.8e19 for a
3 Gbp contig (past 2^63) but a full-genome Gini is ~1e28 of the 1e38
decimal headroom.  ``gini_num``/``gini_den`` travel as the exact digit
STRING of that decimal (hash-stable cross-engine — ADVICE r8); the
other columns stay BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aligned_spans_expr(pos: Column) -> Column:
    """array<struct<s,e>> of aligned reference spans from the ``cigar``
    column: one codegen fold — M/=/X emit a span and advance the
    reference offset, D/N advance silently (matching samtools' exclusion
    of deletion/skip gaps from depth), I/S/H/P consume no reference.  No
    UDF, no per-op Python; mirrored independently by
    ``tools/build_oracle_fixtures.aligned_spans`` (Python re walk)."""
    lens = F.transform(
        F.regexp_extract_all("cigar", F.lit(r"(\d+)[MIDNSHP=X]"), 1),
        lambda x: x.cast("long"),
    )
    ops = F.regexp_extract_all("cigar", F.lit(r"\d+([MIDNSHP=X])"), 1)
    init = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array().cast("array<struct<s:bigint,e:bigint>>").alias("spans"),
    )
    return F.aggregate(
        F.zip_with(lens, ops, lambda l, o: F.struct(l.alias("l"), o.alias("o"))),
        init,
        lambda acc, x: F.struct(
            (
                acc["off"]
                + F.when(x["o"].isin("M", "=", "X", "D", "N"), x["l"]).otherwise(0)
            ).alias("off"),
            F.when(
                x["o"].isin("M", "=", "X"),
                F.concat(
                    acc["spans"],
                    F.array(
                        F.struct(
                            (pos + acc["off"]).alias("s"),
                            (pos + acc["off"] + x["l"] - 1).alias("e"),
                        )
                    ),
                ),
            ).otherwise(acc["spans"]).alias("spans"),
        ),
    )["spans"]


def coverage_gini(spans: DataFrame) -> DataFrame:
    """Per-contig coverage statistics over COVERED bases (depth ≥ 1) from
    an aligned-span table (rname, s, e) — closed 1-based coordinates,
    spans may overlap arbitrarily.

    Returns (rname, n_covered, total_depth, max_depth) as BIGINT plus
    (gini_num, gini_den) as STRING holding the exact DECIMAL(38,0)
    digits; gini_num/gini_den is the exact Gini coefficient of the
    per-base depth distribution (0 = perfectly uniform).  STRING, not
    DECIMAL, on the wire (ADVICE r8): the arithmetic runs in
    DECIMAL(38,0) — wide enough for a full-genome contig — but decimal
    OUTPUT defeats cross-engine hash witnessing (DuckDB's pandas fetch
    renders DECIMAL(38,0) as float64, '1207979652.0' vs '1207979652'),
    while the digit string is representation-stable in every engine and
    loses nothing (both values are nonnegative integers; consumers
    ``int()`` them).  Scale shape: two slim shuffles keyed on
    (rname, p) then (rname, depth), two per-contig windows (contig
    count is O(100); a single pathological contig would
    range-partition on (rname, p) with boundary fix-up, which the run
    representation admits), and a final per-contig aggregate.  Nothing
    explodes per-base, and the decimal arithmetic touches only the
    tiny histogram frame — the span-scale exchanges stay BIGINT.
    """
    from pyspark.sql import Window

    # +1/-1 breakpoint events per span, emitted by ONE explode instead of a
    # union of two selects over the same subtree — Catalyst does no
    # cross-branch CSE, so the union form evaluated the whole span source
    # (g27: the Python BAM decode) twice (r13 session 5, the s09
    # explode-mirror lesson).  Same (rname, p, d) multiset.
    ev = spans.select(
        "rname",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("p"), F.lit(1).alias("d")),
                F.struct((F.col("e") + 1).alias("p"), F.lit(-1).alias("d")),
            )
        ).alias("ev"),
    ).select("rname", "ev.p", "ev.d")
    deltas = ev.groupBy("rname", "p").agg(F.sum("d").alias("delta"))
    w = Window.partitionBy("rname").orderBy("p")
    runs = deltas.select(
        "rname",
        "p",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("depth"),
        F.lead("p").over(w).alias("np"),
    )
    # the final breakpoint of each contig always closes to depth 0, so the
    # np IS NULL row carries no covered bases by construction
    cov = (
        runs.filter((F.col("depth") >= 1) & F.col("np").isNotNull())
        .groupBy("rname", "depth")
        .agg(F.sum(F.col("np") - F.col("p")).alias("c"))
    )
    wd = Window.partitionBy("rname").orderBy("depth")
    # Decimal headroom guard (the t17 lesson applied to its sibling —
    # VERDICT r6 directive #5, widened to DECIMAL(38,0) by r7 directive
    # #6): every product the final aggregate computes is bounded by
    # 2·max_depth·N·(N+1) for a contig with N covered bases, so requiring
    # that bound < 5e37 (margin below the DECIMAL(38,0) ceiling of 1e38,
    # where ANSI mode would raise a generic ARITHMETIC_OVERFLOW) keeps
    # the failure NAMED.  A 3 Gbp contig at 1e9× pileup sits at ~1.8e28 —
    # ten orders inside the bound — so real genomes always compute; only
    # synthetic coordinate spaces past ~1e18 bases can trip it.  The
    # check rides the ranksum2 column of the tiny per-(contig, depth)
    # histogram — evaluated before any product term, over the same
    # per-contig exchange the wd window already pays (an unbounded frame
    # on the same partition key adds no shuffle).  Run-length rows make N
    # independent of row count (one genome-length span is 2 rows), hence
    # a RUNTIME guard, not a row-count heuristic.
    wfull = Window.partitionBy("rname").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_tot = F.sum("c").over(wfull)
    d_max = F.max("depth").over(wfull)
    # TWO bounds (r8 review finding): the decimal products need
    # 2·max_depth·N·(N+1) < 5e37, AND the still-BIGINT total_depth
    # column needs max_depth·N < 4e18 (double-side margin below 2^63) —
    # the old 4e18 bound on the cubic implied the latter, the widened
    # decimal bound alone does not (10,001 spans of 1e15 bases pass the
    # cubic at ~2e34 yet put total_depth at 1.0001e19 > 2^63).
    unsafe = (
        (
            2.0 * d_max.cast("double") * n_tot.cast("double")
            * (n_tot.cast("double") + 1.0)
        )
        >= 5.0e37
    ) | ((d_max.cast("double") * n_tot.cast("double")) >= 4.0e18)
    dec = "decimal(38,0)"
    cum = F.sum(F.col("c").cast(dec)).over(
        wd.rowsBetween(Window.unboundedPreceding, 0)
    )
    c_dec = F.col("c").cast(dec)
    ranked = cov.withColumn(
        # DOUBLED rank sum of an equal-depth block over the sorted
        # per-base multiset (difference of consecutive 2·triangular
        # numbers) — the Gini identity's leading 2· absorbs the /2, so
        # the decimal path needs no integral division at all
        "ranksum2",
        F.when(
            unsafe,
            F.raise_error(
                F.concat(
                    F.lit(
                        "coverage_gini DECIMAL(38,0) headroom exceeded "
                        "on contig "
                    ),
                    F.col("rname"),
                    F.lit(": 2*max_depth*N*(N+1) = "),
                    F.format_number(
                        2.0 * d_max.cast("double") * n_tot.cast("double")
                        * (n_tot.cast("double") + 1.0),
                        0,
                    ),
                    F.lit(" (bound 5e37) or max_depth*N = "),
                    F.format_number(
                        d_max.cast("double") * n_tot.cast("double"), 0
                    ),
                    F.lit(
                        " (bound 4e18) exceeded — the exact Gini "
                        "products would overflow DECIMAL(38,0) or the "
                        "BIGINT total_depth; no physical genome reaches "
                        "either (SCALE.md)"
                    ),
                )
            ).cast(dec),
        ).otherwise(cum * (cum + 1) - (cum - c_dec) * (cum - c_dec + 1)),
    )
    d_dec = F.col("depth").cast(dec)
    return (
        ranked.groupBy("rname")
        .agg(
            F.sum("c").alias("n_covered"),
            F.sum(F.col("depth") * F.col("c")).alias("total_depth"),
            F.max("depth").alias("max_depth"),
            (
                F.sum(d_dec * F.col("ranksum2"))
                - (F.sum(c_dec) + 1) * F.sum(d_dec * c_dec)
            ).cast(dec).cast("string").alias("gini_num"),
            (F.sum(c_dec) * F.sum(d_dec * c_dec))
            .cast(dec).cast("string").alias("gini_den"),
        )
        .orderBy("rname")
    )

"""Distributed connected components: alternating large-star / small-star.

Public algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond" (SoCC 2014).  Each round is
two window-min exchanges over the (slim, two-long-column) edge list and
provably converges in O(log n) rounds — unlike min-label propagation, whose
round count is the component DIAMETER: a 100 TB corpus with chained
near-dups (A~B~C~...) can have paths thousands of hops long, while
large-star/small-star halves them every round.

No counterpart in the reference (tomwhite/disq-original has no graph
operators); this backs the dedup pipeline's cluster-assignment step (d07).

Scale shape: the edge list stays in its canonical (big, small) direction,
every shuffle carries exactly two longs, each round lazily
localCheckpoints so lineage stays flat at one job per round, and the only
driver-side value is the per-round (count, xor-hash) edge-set fingerprint
— never the labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def connected_components(
    pairs: DataFrame, a: str = "a_id", b: str = "b_id", max_iters: int = 30
) -> tuple[DataFrame, int]:
    """Labels every node of the undirected graph given by ``pairs`` with the
    MINIMUM node id of its component (matching the recursive-closure oracle).

    Returns ``(labels, rounds)`` where labels has columns (node, label) and
    ``rounds`` is the number of large-star+small-star rounds executed.
    Raises RuntimeError if ``max_iters`` rounds do not reach the star-graph
    fixed point — loud, never a silent unconverged result (O(log n) bound
    means hitting 30 implies a bug or an adversarial input, not bad luck).
    """
    # canonical direction big -> small; self-loops dropped.  The checkpoint
    # is LAZY: the sig() fingerprint job right below materializes it, so the
    # candidate-pair pipeline runs inside that job instead of paying a
    # separate eager-checkpoint job first — one less driver round-trip, same
    # work, same storage (d07 interleaved A/B at sf0.1, two runs of 6:
    # min 3.68/3.32 eager vs 3.08/3.15 lazy; medians within noise).
    edges = (
        pairs.select(
            F.greatest(F.col(a), F.col(b)).alias("u"),
            F.least(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def sig(df: DataFrame) -> tuple:
        # one-job set fingerprint over the (already materialized, distinct)
        # edge set: count + xxhash64 bit_xor (xor never overflows under
        # ANSI mode and is exact on a duplicate-free set).  Fixed-point
        # detection by fingerprint equality — a false positive needs a
        # 64-bit collision between consecutive rounds (~2^-64); the
        # oracle-matched labels and the convergence tests pin the behavior.
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    prev = sig(edges)
    w = Window.partitionBy("u")
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # large-star: over SYMMETRIC neighborhoods N(u), connect every
        # strictly-larger neighbor v > u to m = min(N(u) ∪ {u}).  The
        # neighborhood min is a window over the partition key — ONE exchange
        # per star instead of groupBy+join's two; duplicates are tolerated
        # (small-star's window-min and the final distinct absorb them)
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            sym.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: edges already point big -> small, so N(u) here are the
        # strictly-smaller neighbors; connect them (and u) to their min m
        sm = large.withColumn("m", F.min("v").over(w))
        small = (
            sm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(sm.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            # lazy checkpoint: the sig() action below materializes it, so a
            # round costs ONE job while lineage still resets every round
            .localCheckpoint(eager=False)
        )
        cur = sig(small)
        edges = small
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(O(log n) expected); refusing to return unconverged labels"
        )
    # Airtight convergence check: fingerprint equality alone would return
    # wrong labels on a ~2^-64 hash collision between consecutive rounds.
    # A star graph has disjoint leaf/center sets, so assert directly that no
    # node appears both as a leaf (u) and a center (v) — one slim semi-join
    # + limit(1), cost bounded by a single extra job on two long columns.
    if (
        edges.join(
            edges.select(F.col("v").alias("u")).distinct(), "u", "left_semi"
        )
        .limit(1)
        .count()
        > 0
    ):
        raise RuntimeError(
            "connected_components fingerprint claimed convergence but the "
            "edge set is not a star graph (a leaf is also a center); "
            "refusing to return unconverged labels"
        )
    # stars: every non-root is a leaf (u, root); roots appear only as v
    leaves = edges.select(F.col("u").alias("node"), F.col("v").alias("label"))
    roots = (
        edges.select(F.col("v").alias("node"))
        .distinct()
        .join(leaves.select("node"), "node", "left_anti")
        .withColumn("label", F.col("node"))
    )
    return leaves.unionByName(roots), rounds

"""Value contract for `_two_level_cum` (relational.py): the two-level
running sum over a (part…, cents, c) histogram must equal the plain
global-order cumulative sum on every input shape — including the shapes
the bucketing could get wrong (values straddling bucket boundaries,
empty buckets between occupied ones, a single bucket, one row, counts
large enough that bucket prefixes matter).  Seeded-random cases rather
than hypothesis: each example pays a Spark job, so a small fixed corpus
of adversarial shapes beats hundreds of blind draws."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from disq_original_spark.queries.relational import _CUM_BUCKET, _two_level_cum

CASES = {
    "single_row": [(0, 7)],
    "single_bucket": [(1, 2), (5, 1), (99_999, 3)],
    "boundary_straddle": [
        (_CUM_BUCKET - 1, 4),
        (_CUM_BUCKET, 5),
        (_CUM_BUCKET + 1, 6),
        (3 * _CUM_BUCKET, 1),
    ],
    "empty_middle_buckets": [(0, 1), (10 * _CUM_BUCKET + 17, 2)],
    "zero_counts_mixed": [(3, 0), (7, 2), (_CUM_BUCKET + 3, 0), (2 * _CUM_BUCKET, 9)],
}
# distinct cents keys: _two_level_cum's input contract is a HISTOGRAM
# (unique keys) — duplicate keys would make the within-bucket running
# sum tie-order-dependent and the brute-force compare flaky
# (code-review r13b)
rng = random.Random(13)
CASES["random_sparse"] = sorted(
    (cents, rng.randrange(1, 1000))
    for cents in rng.sample(range(50 * _CUM_BUCKET), 200)
)


def _brute(rows):
    out, running = [], 0
    for cents, c in sorted(rows):
        running += c
        out.append((cents, c, running))
    return out


def test_two_level_cum_equals_global_running_sum(spark):
    for name, rows in CASES.items():
        hist = spark.createDataFrame(rows, "cents long, c long")
        got = sorted(
            (r["cents"], r["c"], r["cum"])
            for r in _two_level_cum(hist).collect()
        )
        assert got == _brute(rows), name


def test_two_level_cum_partitioned_with_total(spark):
    """The partitioned + with_total form (q32's usage): per-group cum
    equals the per-group brute force and n is the group total on every
    row."""
    rows = [
        ("A", cents, c) for cents, c in CASES["random_sparse"][:80]
    ] + [
        ("B", cents, c + 1) for cents, c in CASES["boundary_straddle"]
    ] + [
        ("C", 0, 5)
    ]
    hist = spark.createDataFrame(rows, "g string, cents long, c long")
    got = _two_level_cum(hist, part=("g",), with_total=True).collect()
    by_g: dict[str, list] = {}
    for g, cents, c in rows:
        by_g.setdefault(g, []).append((cents, c))
    for g, grp in by_g.items():
        want = _brute(grp)
        total = sum(c for _, c in grp)
        mine = sorted(
            (r["cents"], r["c"], r["cum"]) for r in got if r["g"] == g
        )
        assert mine == want, g
        assert all(r["n"] == total for r in got if r["g"] == g), g

"""Brute-force oracle for g06 (windowed coverage over the real sharded BAM).

DuckDB cannot read BAM, so this is the exhaustive Python recomputation of the
same definition: alignment end = pos + sum of reference-consuming CIGAR op
lengths (M/D/N/=/X) - 1; a read contributes depth to every window its span
touches."""

from __future__ import annotations

import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from disq_original_spark.queries import QUERIES

_WIN = 1000
_CIG = re.compile(r"(\d+)([MIDNSHP=X])")
_REF_OPS = set("MDN=X")


def test_g06_matches_bruteforce(spark, sf_dir):
    df = QUERIES["g06_coverage_windows"].build(spark, sf_dir)

    from disq_original_spark.sources.bam import BamSource

    reads = BamSource().read(
        spark,
        "/root/reference/src/test/resources/"
        "HiSeq.1mb.1RG.2k_lines.alternate.recalibrated.DIQ.sharded.bam",
    )
    depth: dict[tuple[str, int], int] = defaultdict(int)
    mapqs: dict[tuple[str, int], list[int]] = defaultdict(list)
    for r in reads.select("rname", "pos", "mapq", "cigar", "flag").collect():
        if r["rname"] is None or (r["flag"] & 4):
            continue
        ref_len = sum(
            int(n) for n, op in _CIG.findall(r["cigar"] or "") if op in _REF_OPS
        )
        end = max(r["pos"], r["pos"] + ref_len - 1)  # same clamp as the query
        for w in range(r["pos"] // _WIN, end // _WIN + 1):
            depth[(r["rname"], w * _WIN)] += 1
            mapqs[(r["rname"], w * _WIN)].append(r["mapq"])

    got = {
        (r["rname"], r["win_start"]): (r["depth"], r["avg_mapq"])
        for r in df.collect()
    }
    assert set(got) == set(depth)
    for key, d in depth.items():
        # Spark round() is HALF_UP; Python round() is banker's — match Spark.
        avg = float(
            Decimal(repr(sum(mapqs[key]) / len(mapqs[key]))).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
        )
        assert got[key] == (d, avg), key
    assert sum(depth.values()) > 0


def test_merge_intervals_edge_cases(spark):
    """Closed-interval semantics on crafted spans: book-ended intervals merge
    (bedtools -d 0 default), a single uncovered base splits, containment
    collapses, contigs stay isolated."""
    from disq_original_spark.operators.interval import merge_intervals

    rows = [
        ("c1", 1, 10),
        ("c1", 11, 20),   # book-ended (no base between) → merges (-d 0)
        ("c1", 22, 30),   # one uncovered base (21) → new island
        ("c1", 23, 25),   # contained
        ("c1", 25, 40),   # chained extension
        ("c2", 1, 10),    # other contig: isolated
    ]
    df = spark.createDataFrame(rows, "contig string, s long, e long")
    got = sorted(
        (r.contig, r.merged_start, r.merged_end, r.n_intervals)
        for r in merge_intervals(df, contig="contig", start="s", end="e").collect()
    )
    assert got == [
        ("c1", 1, 20, 2),
        ("c1", 22, 40, 3),
        ("c2", 1, 10, 1),
    ]


def test_subtract_intervals_edge_cases(spark):
    """Closed-interval subtraction on crafted spans: full cover drops the
    interval, interior cover splits it, edge cover trims it, no-b contigs
    pass through whole, and b fragments merge before subtracting."""
    from disq_original_spark.operators.interval import subtract_intervals

    a = spark.createDataFrame(
        [
            ("c1", 10, 30),   # b covers [12,18]+[15,22] (merged) → trims to two frags
            ("c1", 40, 50),   # fully covered by [35, 60] → vanishes
            ("c1", 70, 80),   # untouched on a covered contig
            ("c2", 1, 10),    # contig with no b at all → whole
        ],
        "contig string, s long, e long",
    )
    b = spark.createDataFrame(
        [("c1", 12, 18), ("c1", 15, 22), ("c1", 35, 60)],
        "contig string, s long, e long",
    )
    got = sorted(
        (r.contig, r.s, r.e, r.frag_start, r.frag_end)
        for r in subtract_intervals(
            a, b, contig="contig", start="s", end="e", bin_size=16, low=0, high=100
        ).collect()
    )
    assert got == [
        ("c1", 10, 30, 10, 11),
        ("c1", 10, 30, 23, 30),
        ("c1", 70, 80, 70, 80),
        ("c2", 1, 10, 1, 10),
    ]


def test_closest_intervals_edge_cases(spark):
    """Crafted nearest-neighbor cases: overlap wins at distance 0, left/right
    competition, exact distance tie broken to the smaller (b_s, b_e), and
    contigs with no b at all keep NULL columns."""
    from disq_original_spark.operators.interval import closest_intervals

    a = spark.createDataFrame(
        [
            (1, "c1", 100, 110),  # overlaps [105,120] → d=0
            (2, "c1", 300, 310),  # left d=180 vs right d=90 → right [400,410]
            (3, "c1", 500, 510),  # left d=90 == right d=90 → tie → [400,410]
            (4, "c2", 10, 20),    # no b on contig → NULLs
        ],
        "id long, contig string, s long, e long",
    )
    b = spark.createDataFrame(
        [("c1", 105, 120), ("c1", 400, 410), ("c1", 600, 605)],
        "contig string, s long, e long",
    )
    got = {
        r.id: (r.b_s, r.b_e, r.distance)
        for r in closest_intervals(
            a, b, id_col="id", contig="contig", start="s", end="e", bin_size=1000
        ).collect()
    }
    assert got == {
        1: (105, 120, 0),
        2: (400, 410, 90),
        3: (400, 410, 90),
        4: (None, None, None),
    }


def _py_merge(rows):
    """Brute-force closed-interval merge: {contig: [(s, e, n), ...]}."""
    out = {}
    by_c = {}
    for c, s, e in rows:
        by_c.setdefault(c, []).append((s, e))
    for c, iv in by_c.items():
        iv.sort()
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1] + 1:  # overlap or book-ended (-d 0)
                ms, me, n = merged[-1]
                merged[-1] = (ms, max(me, e), n + 1)
            else:
                merged.append((s, e, 1))
        out[c] = merged
    return out


def test_interval_ops_randomized_differential(spark):
    """merge/subtract/closest on random interval sets vs brute-force Python —
    the property sweep that crafted cases can't cover (dense pileups, long
    containments, exact-touch chains, empty contigs)."""
    import random

    from disq_original_spark.operators.interval import (
        closest_intervals,
        merge_intervals,
        subtract_intervals,
    )

    for seed in (7, 23, 91):
        rng = random.Random(seed)

        def rand_ivs(n, tag):
            rows = []
            for i in range(n):
                c = f"c{rng.randrange(3)}"
                s = rng.randrange(0, 500)
                rows.append((tag * 1000 + i, c, s, s + rng.randrange(0, 60)))
            return rows

        a_rows, b_rows = rand_ivs(60, 1), rand_ivs(40, 2)
        a = spark.createDataFrame(a_rows, "id long, contig string, s long, e long")
        b = spark.createDataFrame(b_rows, "id long, contig string, s long, e long")

        # ---- merge
        want = _py_merge([(c, s, e) for _i, c, s, e in b_rows])
        got = {}
        for r in merge_intervals(b, contig="contig", start="s", end="e").collect():
            got.setdefault(r.contig, []).append(
                (r.merged_start, r.merged_end, r.n_intervals)
            )
        assert {c: sorted(v) for c, v in got.items()} == {
            c: sorted(v) for c, v in want.items() if v
        }, f"merge seed {seed}"

        # ---- subtract: fragments of each a minus merged b
        def py_subtract(aid, c, s, e):
            frags, cur = [], s
            for ms, me, _n in want.get(c, []):
                if me < cur or ms > e:
                    continue
                if ms > cur:
                    frags.append((cur, ms - 1))
                cur = max(cur, me + 1)
            if cur <= e:
                frags.append((cur, e))
            return [(aid, f0, f1) for f0, f1 in frags]

        want_sub = sorted(
            f for (aid, c, s, e) in a_rows for f in py_subtract(aid, c, s, e)
        )
        got_sub = sorted(
            (r.id, r.frag_start, r.frag_end)
            for r in subtract_intervals(
                a, b, contig="contig", start="s", end="e", bin_size=64, low=0, high=600
            ).collect()
        )
        assert got_sub == want_sub, f"subtract seed {seed}"

        # ---- closest: min (distance, b_s, b_e) per a
        def py_closest(c, s, e):
            cands = [
                (max(0, max(bs - e, s - be)), bs, be)
                for (_i, bc, bs, be) in b_rows
                if bc == c
            ]
            return min(cands) if cands else (None, None, None)

        want_cl = {
            aid: py_closest(c, s, e) for (aid, c, s, e) in a_rows
        }
        got_cl = {
            r.id: ((r.distance, r.b_s, r.b_e) if r.b_s is not None else (None, None, None))
            for r in closest_intervals(
                a, b, id_col="id", contig="contig", start="s", end="e", bin_size=64
            ).collect()
        }
        assert got_cl == want_cl, f"closest seed {seed}"

"""QC operators (g11 per-cycle quality, g12 Ts/Tv) recomputed from the
decoded rows in Python — same differential posture as test_dupmark.py."""

from __future__ import annotations

import pytest

from disq_original_spark.queries import QUERIES

FIXTURES = "/root/reference/src/test/resources"


def test_g11_cycle_quality_matches_python(spark):
    from disq_original_spark.sources.bam import BamSource

    got = {r.cycle: r for r in QUERIES["g11_cycle_quality"].build(spark, "unused").collect()}
    rows = (
        BamSource()
        .read(spark, f"{FIXTURES}/1.bam")
        .select("flag", "seq", "qual")
        .collect()
    )
    agg: dict[int, list] = {}
    for r in rows:
        if r.flag & (256 + 2048) or r.qual == "*":
            continue
        for i, (b, q) in enumerate(zip(r.seq, r.qual), start=1):
            a = agg.setdefault(i, [0, 0, 0, 0, 0, 0])  # n, qsum, A, C, G, T
            a[0] += 1
            a[1] += ord(q) - 33
            for j, base in enumerate("ACGT", start=2):
                if b == base:
                    a[j] += 1
    assert set(got) == set(agg)
    for cyc, a in agg.items():
        g = got[cyc]
        assert g.n == a[0]
        assert g.avg_qual == round(a[1] / a[0], 2)
        assert g.frac_a == pytest.approx(round(a[2] / a[0], 4))
        assert g.frac_c == pytest.approx(round(a[3] / a[0], 4))
        assert g.frac_g == pytest.approx(round(a[4] / a[0], 4))
        assert g.frac_t == pytest.approx(round(a[5] / a[0], 4))


def test_g12_tstv_matches_python(spark):
    from disq_original_spark.sources.vcf import VcfSource

    row = QUERIES["g12_tstv"].build(spark, "unused").collect()[0]
    rows = (
        VcfSource()
        .read(spark, f"{FIXTURES}/HiSeq.10000.vcf.bgz")
        .select("ref", "alts")
        .collect()
    )
    n_ts = n_tv = 0
    for r in rows:
        if len(r.ref) != 1 or len(r.alts) != 1 or len(r.alts[0]) != 1:
            continue
        pair = (r.ref + r.alts[0]).upper()
        if pair in ("AG", "GA", "CT", "TC"):
            n_ts += 1
        else:
            n_tv += 1
    assert row.n_snv == n_ts + n_tv
    assert row.n_ts == n_ts
    assert row.n_tv == n_tv
    assert row.tstv == round(n_ts / n_tv, 4)


def test_g13_region_depth_matches_python(spark):
    """Full-scan Python CIGAR walk vs the interval-pruned distributed
    pileup: every in-region position's depth must match exactly — this also
    cross-checks that .bai split pruning dropped no overlapping read."""
    import collections
    import re as _re

    from disq_original_spark.queries.genomic import _G13_REGION
    from disq_original_spark.sources.bam import BamSource

    contig, rs, re_ = _G13_REGION
    got = {
        r.position: r.depth
        for r in QUERIES["g13_region_depth"].build(spark, "unused").collect()
    }
    rows = (
        BamSource()
        .read(
            spark,
            f"{FIXTURES}/HiSeq.1mb.1RG.2k_lines.alternate.recalibrated.DIQ.sharded.bam",
        )
        .select("flag", "rname", "pos", "cigar")
        .collect()
    )
    depth: dict[int, int] = collections.defaultdict(int)
    for r in rows:
        if r.rname != contig or r.flag & (4 + 256 + 2048):
            continue
        off = 0
        for n, op in _re.findall(r"(\d+)([MIDNSHP=X])", r.cigar):
            n = int(n)
            if op in "M=X":
                for p in range(max(r.pos + off, rs), min(r.pos + off + n - 1, re_) + 1):
                    depth[p] += 1
                off += n
            elif op in "DN":
                off += n
    assert got == dict(depth)


def test_g15_idxstats_matches_python(spark):
    """Every idxstats row — header order, lengths, mapped/unmapped splits,
    the '*' tail — recomputed from the decoded reads."""
    from disq_original_spark.sources.bam import BamSource
    from disq_original_spark.sources.headers import read_bam_header

    path = f"{FIXTURES}/1.bam"
    _h, seq_dict, _ = read_bam_header(path)
    rows = BamSource().read(spark, path).select("rname", "flag").collect()
    counts: dict[str, list[int]] = {}
    for r in rows:
        c = r.rname if r.rname is not None else "*"
        a = counts.setdefault(c, [0, 0])
        a[0 if not (r.flag & 4) else 1] += 1
    got = QUERIES["g15_idxstats"].build(spark, "unused").collect()
    assert [g.contig for g in got] == [n for n, _l in seq_dict] + ["*"]
    assert [g.length for g in got] == [l for _n, l in seq_dict] + [0]
    for g in got:
        want = counts.get(g.contig, [0, 0])
        assert (g.n_mapped, g.n_unmapped) == tuple(want), g.contig
    # the fixture has real signal on contig 1 and a real unmapped tail
    assert counts["1"][0] > 0 and counts["1"][1] > 0

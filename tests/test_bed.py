"""BED source/sink: coordinate-convention conversion (0-based half-open on
disk ↔ 1-based closed in the operators), header/track filtering, optional
columns, round-trip, and end-to-end composition with merge_intervals."""

from __future__ import annotations

from disq_original_spark.sources.bed import BedSource, write_bed


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "in.bed"
    p.write_text(body)
    return str(p)


def test_bed_read_converts_and_filters(spark, tmp_path):
    p = _write(
        tmp_path,
        "browser position chr1\ntrack name=x\n# comment\n"
        "chr1\t0\t100\tfeat1\t5\t+\nchr2\t50\t60\n\n",
    )
    rows = sorted(
        (r.contig, r.start, r.end, r.name, r.score, r.strand)
        for r in BedSource().read(spark, p).collect()
    )
    assert rows == [
        ("chr1", 1, 100, "feat1", 5, "+"),
        ("chr2", 51, 60, None, None, None),
    ]


def test_bed_roundtrip_single_file(spark, tmp_path):
    p = _write(tmp_path, "chr1\t0\t100\tf\t1\t-\nchr1\t200\t250\tg\t2\t+\n")
    df = BedSource().read(spark, p)
    out = str(tmp_path / "out.bed")
    write_bed(df.repartition(3), out)
    back = sorted(
        (r.contig, r.start, r.end, r.name, r.score, r.strand)
        for r in BedSource().read(spark, out).collect()
    )
    assert back == sorted(
        (r.contig, r.start, r.end, r.name, r.score, r.strand) for r in df.collect()
    )
    # on-disk content is spec BED: 0-based half-open
    lines = sorted(open(out).read().splitlines())
    assert lines == ["chr1\t0\t100\tf\t1\t-", "chr1\t200\t250\tg\t2\t+"]


def test_bed_feeds_interval_operators(spark, tmp_path):
    """The loaded intervals drive the bedtools-family operators directly:
    adjacent BED features ([0,100) + [100,150) = closed [1,100]+[101,150])
    merge into one island under closed-interval touch semantics."""
    from disq_original_spark.operators.interval import merge_intervals

    p = _write(tmp_path, "chr1\t0\t100\nchr1\t100\t150\nchr1\t300\t400\n")
    iv = BedSource().read(spark, p)
    got = sorted(
        (r.contig, r.merged_start, r.merged_end, r.n_intervals)
        for r in merge_intervals(iv).collect()
    )
    assert got == [("chr1", 1, 150, 2), ("chr1", 301, 400, 1)]


def test_bed_lenient_on_malformed_and_placeholder(spark, tmp_path):
    """One malformed line (space-separated, truncated, or bad coordinate)
    drops instead of aborting the ANSI-mode job; '.' placeholders read back
    as NULL; NULL optionals round-trip as '.' without column shift."""
    p = _write(
        tmp_path,
        "chr1\t0\t100\tfeat1\t.\t+\n"
        "chr2 5 10\n"            # space-separated → drops
        "chr3\t7\n"              # truncated → drops
        "chr4\tx\t10\n"          # bad coordinate → drops
        "chr5\t10\t20\n",
    )
    df = BedSource().read(spark, p)
    rows = sorted(
        (r.contig, r.start, r.end, r.name, r.score, r.strand) for r in df.collect()
    )
    assert rows == [
        ("chr1", 1, 100, "feat1", None, "+"),
        ("chr5", 11, 20, None, None, None),
    ]
    out = str(tmp_path / "out.bed")
    write_bed(df, out)
    # strand must stay in the strand slot even with a NULL score before it
    lines = sorted(open(out).read().splitlines())
    assert lines == ["chr1\t0\t100\tfeat1\t.\t+", "chr5\t10\t20\t.\t.\t."]
    back = sorted(
        (r.contig, r.start, r.end, r.name, r.score, r.strand)
        for r in BedSource().read(spark, out).collect()
    )
    assert back == rows

"""SAM source/sink: differential against the reference's test.sam fixture
(read-only at /root/reference/src/test/resources/), roundtrip, interval
filtering — the reference's own test strategy (SURVEY §5)."""

from __future__ import annotations

from pathlib import Path

import pytest

from disq_original_spark.sources.headers import SamHeader
from disq_original_spark.sources.sam import (
    SamSink,
    SamSource,
    with_alignment_span,
)

FIXTURE = "/root/reference/src/test/resources/test.sam"


def _oracle_records(path: str) -> list[str]:
    return [
        line.rstrip("\n")
        for line in Path(path).read_text().splitlines()
        if line and not line.startswith("@")
    ]


@pytest.fixture(scope="module")
def sam_df(spark):
    return SamSource().read(spark, FIXTURE)


def test_count_matches_single_threaded_oracle(sam_df):
    assert sam_df.count() == len(_oracle_records(FIXTURE))


def test_parse_fields(sam_df):
    rows = {r["qname"]: r for r in sam_df.collect()}
    oracle = _oracle_records(FIXTURE)
    for line in oracle:
        f = line.split("\t")
        row = rows[f[0]]
        assert row["flag"] == int(f[1])
        assert (row["rname"] or "*") == f[2]
        assert row["pos"] == int(f[3])
        assert row["cigar"] == f[5]
        assert row["seq"] == f[9]
        # aux tags preserved with type info
        for tag in f[11:]:
            k, rest = tag.split(":", 1)
            assert row["attributes"][k] == rest


def test_header_parse():
    h = SamSource().read_header(FIXTURE)
    assert h.text.startswith("@HD")
    assert all(isinstance(c, tuple) for c in h.contigs)


def test_roundtrip_single_file(spark, tmp_path, sam_df):
    out = str(tmp_path / "out.sam")
    header = SamSource().read_header(FIXTURE)
    SamSink().write(sam_df, header, out)
    # header preserved
    text = Path(out).read_text()
    assert text.startswith(header.text)
    # semantic roundtrip: re-read equals original (as multisets of lines)
    again = SamSource().read(spark, out)
    orig_lines = sorted(_oracle_records(FIXTURE))
    new_lines = sorted(
        line for line in text.splitlines() if line and not line.startswith("@")
    )
    assert new_lines == orig_lines
    assert again.count() == sam_df.count()


def test_sharded_write_and_read_back(spark, tmp_path, sam_df):
    out = str(tmp_path / "out.sam.sharded")
    header = SamSource().read_header(FIXTURE)
    SamSink().write_sharded(sam_df.repartition(3), header, out)
    parts = sorted(Path(out).glob("part-*.sam"))
    assert parts, "no shards written"
    # each shard is a complete SAM (header present); dir reads back as one input
    for p in parts:
        assert p.read_text().startswith("@HD")
    again = SamSource().read(spark, out)
    assert again.count() == sam_df.count()


def test_interval_filter_matches_python_oracle(spark, sam_df):
    intervals = spark.createDataFrame(
        [("chr21", 5000, 9999), ("chr21", 20000, 22999)],
        "contig string, start long, end long",
    )
    got = SamSource().read(spark, FIXTURE, intervals=intervals)
    got_names = sorted(r["qname"] + "/" + str(r["flag"]) for r in got.collect())

    # single-threaded python oracle with the same overlap semantics
    expected = []
    for r in with_alignment_span(sam_df).collect():
        if r["flag"] & 0x4 and (r["rname"] is None or r["pos"] == 0):
            continue
        for c, s, e in [("chr21", 5000, 9999), ("chr21", 20000, 22999)]:
            if r["rname"] == c and r["pos"] <= e and r["end_pos"] >= s:
                expected.append(r["qname"] + "/" + str(r["flag"]))
                break
    assert got_names == sorted(expected)


def test_interval_filter_with_unplaced(spark, sam_df):
    intervals = spark.createDataFrame(
        [("chr21", 1, 1_000_135)], "contig string, start long, end long"
    )
    all_placed = SamSource().read(spark, FIXTURE, intervals=intervals)
    with_unplaced = SamSource().read(
        spark, FIXTURE, intervals=intervals, include_unplaced=True
    )
    n_unplaced = sam_df.filter("flag & 4 != 0 AND (rname IS NULL OR pos = 0)").count()
    assert with_unplaced.count() == all_placed.count() + n_unplaced


def test_mapped_only_rejected(spark):
    # reference: intervals==null && !unmapped is an error
    # (AbstractBinarySamSource.java:50-54) — our interval_filter mirrors it
    from disq_original_spark.operators.interval import interval_filter

    with pytest.raises(ValueError):
        interval_filter(None, None, include_unplaced=False)


def test_validation_stringency(spark, tmp_path):
    """Reference parity: STRICT fails, SILENT drops, LENIENT nulls
    (`HtsjdkReadsRddStorage.java:66,97-100`)."""
    import pytest
    from disq_original_spark.sources.sam import SamSource

    p = str(tmp_path / "bad.sam")
    with open(p, "w") as fh:
        fh.write("@HD\tVN:1.6\n")
        fh.write("r1\t0\tchr1\t10\t30\t4M\t*\t0\t0\tACGT\tFFFF\n")
        fh.write("this is not a sam record\n")
        fh.write("r2\t0\tchr1\t20\t30\t4M\t*\t0\t0\tACGT\tFFFF\n")
    src = SamSource()
    assert src.read(spark, p, stringency="lenient").count() == 3
    assert src.read(spark, p, stringency="silent").count() == 2
    with pytest.raises(Exception, match="malformed"):
        src.read(spark, p, stringency="strict").collect()


def test_duplicate_aux_tags_last_wins(spark, tmp_path):
    """Duplicate aux tags follow lenient semantics (last wins), not a
    DUPLICATED_MAP_KEY crash — resolved inside the parse expression, so the
    session's mapKeyDedupPolicy is left untouched for the caller's own
    queries."""
    p = tmp_path / "dup.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "r1\t0\tchr1\t10\t30\t4M\t*\t0\t0\tACGT\tFFFF\tXA:Z:a\tXA:Z:b\n"
    )
    policy_before = spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    rows = SamSource().read(spark, str(p)).collect()
    assert rows[0]["attributes"]["XA"] == "Z:b"
    assert spark.conf.get("spark.sql.mapKeyDedupPolicy", "EXCEPTION") == policy_before


def test_lenient_malformed_row_roundtrips_full_column_count(spark, tmp_path):
    """A lenient-kept malformed record writes a full 11-column line with
    placeholder fields, never a shifted line."""
    p = tmp_path / "bad.sam"
    p.write_text(
        "@HD\tVN:1.6\n"
        "r1\t0\tchr1\tNOTANUMBER\t30\t4M\t*\t0\t0\tACGT\tFFFF\n"
    )
    df = SamSource().read(spark, str(p), stringency="lenient")
    from disq_original_spark.sources.sam import to_sam_line

    line = df.select(to_sam_line(df).alias("v")).collect()[0]["v"]
    assert len(line.split("\t")) == 11
    assert line.split("\t")[3] == "0"  # nulled pos round-trips as placeholder

"""GFF3 source/sink: parse semantics against the committed annotation
fixture, placeholder/malformed-line posture, write round-trip, fixture
freshness, and g25's all-codegen broadcast plan."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from disq_original_spark.queries import QUERIES
from disq_original_spark.sources.gff import GffSource, write_gff

FIXTURE = str(Path(__file__).resolve().parent.parent / "fixtures" / "annotation.gff3")


def test_read_fixture_shape(spark):
    df = GffSource().read(spark, FIXTURE)
    assert df.columns == [
        "seqid", "source", "type", "start", "end",
        "score", "strand", "phase", "attributes",
    ]
    by_type = {r["type"]: r["count"] for r in df.groupBy("type").count().collect()}
    assert set(by_type) == {"gene", "mRNA", "exon"}
    assert by_type["gene"] == 40
    assert sum(by_type.values()) == 489  # comment/directive lines skipped
    first = df.orderBy("seqid", "start", "type").filter(
        F.col("type") == "gene"
    ).first()
    assert first["seqid"] == "chr1" and first["start"] == 1240
    assert first["attributes"] == {"ID": "gene001", "Name": "N001"}
    assert first["score"] is None  # '.' placeholder -> NULL


def test_placeholders_malformed_and_attr_edge_cases(spark, tmp_path):
    p = tmp_path / "t.gff3"
    p.write_text(
        "##gff-version 3\n"
        "# comment mid-file\n"
        "chr1\t.\tgene\t10\t99\t12.5\t-\t.\tID=g1;Note=has=equals;Flag\n"
        "chr1\tsrc\tregion\t1\t1000\t.\t.\t.\t.\n"
        "malformed line without tabs\n"
        "chr1\tsrc\tgene\tnotanumber\t99\t.\t+\t.\tID=bad\n"
        "\n"
    )
    rows = GffSource().read(spark, str(p)).orderBy("start").collect()
    assert len(rows) == 2  # malformed mandatory fields dropped
    region, g1 = rows[0], rows[1]
    assert region["attributes"] == {}  # '.' attributes -> empty map
    assert region["source"] == "src" and region["strand"] is None
    assert g1["score"] == 12.5
    # value keeps everything after the FIRST '='; valueless key -> ''
    assert g1["attributes"] == {"ID": "g1", "Note": "has=equals", "Flag": ""}


def test_duplicate_attribute_tag_last_wins(spark, tmp_path):
    """Repeated tags (out-of-spec but common in the wild) must resolve
    last-wins, not abort the scan with DUPLICATED_MAP_KEY — the VCF INFO
    map's lenient posture, mirrored by the g25 oracle's [-1] extraction."""
    p = tmp_path / "dup.gff3"
    p.write_text(
        "chr1\tsrc\tgene\t10\t99\t.\t+\t.\tID=first;Note=n;ID=last\n"
    )
    rows = GffSource().read(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["attributes"] == {"ID": "last", "Note": "n"}


def test_write_null_mandatory_field_fails_loud(spark, tmp_path):
    """concat_ws silently SKIPS NULLs — a NULL type would shift every
    later column left and corrupt the file; the sink must raise instead."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("chr1", None, None, 10, 99, None, None, None, {})],
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    with _pytest.raises(Exception, match="NULL mandatory field"):
        write_gff(df, str(tmp_path / "bad.gff3"))
    # NULL attributes map (vs empty) is benign: writes the '.' placeholder
    ok = spark.createDataFrame(
        [("chr1", None, "gene", 10, 99, None, None, None, None)],
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    out = str(tmp_path / "ok.gff3")
    write_gff(ok, out)
    assert Path(out).read_text().splitlines()[1].endswith("\t.")


def test_attribute_escaping_roundtrip(spark, tmp_path):
    """Reserved characters inside attribute text must percent-encode on
    write and decode on read — a literal ';' written verbatim would
    silently reparse as two attributes ('Note=a;b' -> {'Note':'a','b':''}).
    ',' is exempt both ways: the comma-joined multi-value string IS this
    source's surface representation."""
    df = spark.createDataFrame(
        [(
            "chr1", None, "gene", 10, 99, None, None, None,
            {
                "Note": "a;b=c&d%e\tf",
                "Parent": "t1,t2",          # multi-value: comma untouched
                "we;rd=key": "v",
                "Lit": "%3B",               # literal percent-triplet
            },
        )],
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    out = str(tmp_path / "esc.gff3")
    write_gff(df, out)
    line = Path(out).read_text().splitlines()[1]
    field9 = line.split("\t")[8]
    assert field9 == (
        "Lit=%253B;Note=a%3Bb%3Dc%26d%25e%09f;Parent=t1,t2;we%3Brd%3Dkey=v"
    )
    back = GffSource().read(spark, out).first()
    assert back["attributes"] == {
        "Note": "a;b=c&d%e\tf",
        "Parent": "t1,t2",
        "we;rd=key": "v",
        "Lit": "%3B",
    }
    # wild-file lowercase hex decodes too
    p = tmp_path / "lower.gff3"
    p.write_text("chr1\t.\tgene\t1\t9\t.\t+\t.\tNote=a%3bb%0ac\n")
    got = GffSource().read(spark, str(p)).first()
    assert got["attributes"] == {"Note": "a;b\nc"}


def test_escape_fuzz_roundtrip(spark, tmp_path):
    """Engine-level fuzz of the %XX codec: decode(encode(s)) == s for
    random strings over the full reserved charset (one Spark job, 400
    strings), and a whole-file write→read round-trip of random attribute
    maps — newlines/tabs/separators inside values must never corrupt the
    tab/line/';' structure."""
    import random

    from pyspark.sql import functions as F2

    from disq_original_spark.sources.gff import _attr_decode, _attr_encode

    rng = random.Random(99)
    charset = "ab %;=&\t\n\r,%%0259BDAbd."
    strings = [
        "".join(rng.choice(charset) for _ in range(rng.randrange(0, 24)))
        for _ in range(398)
    ] + ["%3B", "%253b"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    bad = df.select(
        "s", _attr_decode(_attr_encode(F2.col("s"))).alias("rt")
    ).filter(F2.col("s") != F2.col("rt"))
    assert bad.count() == 0, bad.take(3)
    # sink-side idempotence (VERDICT r5 #8): re-encoding a decoded encoding
    # reproduces the original ENCODED bytes exactly — i.e. the on-disk form
    # of any attribute text is a fixed point; a drifting pair (e.g. '%'
    # ordered wrong on one side) would rewrite files on every copy cycle
    enc = _attr_encode(F2.col("s"))
    bad2 = df.select(
        enc.alias("e1"), _attr_encode(_attr_decode(enc)).alias("e2")
    ).filter(F2.col("e1") != F2.col("e2"))
    assert bad2.count() == 0, bad2.take(3)

    # whole-file round-trip: 60 rows, 1-3 random attributes each
    rows = []
    for i in range(60):
        attrs = {
            "".join(rng.choice(charset) for _ in range(rng.randrange(1, 8))):
            "".join(rng.choice(charset) for _ in range(rng.randrange(0, 16)))
            for _ in range(rng.randrange(1, 4))
        }
        rows.append(("chr1", None, "gene", 10 + i * 100, 99 + i * 100,
                     None, None, None, attrs))
    src = spark.createDataFrame(
        rows,
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    out = str(tmp_path / "fuzz.gff3")
    write_gff(src, out)
    got = {
        r["start"]: r["attributes"]
        for r in GffSource().read(spark, out).collect()
    }
    want = {r[3]: r[8] for r in rows}
    assert got == want


def test_write_null_attribute_value_fails_loud(spark, tmp_path):
    """A NULL map value has no faithful on-disk form (read never produces
    NULL values) and array_join would silently drop the whole entry —
    the sink must raise, mirroring the mandatory-field guard."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("chr1", None, "gene", 10, 99, None, None, None,
          {"ID": "g1", "Note": None})],
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    with _pytest.raises(Exception, match="NULL attribute value"):
        write_gff(df, str(tmp_path / "nullattr.gff3"))


def test_write_roundtrip(spark, tmp_path):
    src = GffSource().read(spark, FIXTURE)
    out = str(tmp_path / "out.gff3")
    write_gff(src, out)
    text = Path(out).read_text()
    assert text.startswith("##gff-version 3\n")
    back = GffSource().read(spark, out)
    a = sorted(map(str, src.collect()))
    b = sorted(map(str, back.collect()))
    assert a == b


def test_sequence_region_roundtrip(spark, tmp_path):
    """Bounds written by the sink must read back through
    read_sequence_regions — the annotation operator's trailing-gap
    capability survives a write→read cycle."""
    from disq_original_spark.sources.gff import read_sequence_regions

    df = spark.createDataFrame(
        [("chr1", None, "gene", 10, 99, None, None, None, {"ID": "g1"})],
        "seqid string, source string, type string, start long, end long,"
        " score double, strand string, phase string,"
        " attributes map<string,string>",
    )
    out = str(tmp_path / "b.gff3")
    write_gff(df, out, sequence_regions=[("chr1", 1, 5000), ("chr2", 1, 900)])
    head = Path(out).read_text().splitlines()[:3]
    assert head == [
        "##gff-version 3",
        "##sequence-region chr1 1 5000",
        "##sequence-region chr2 1 900",
    ]
    got = {
        r["contig"]: r["contig_end"]
        for r in read_sequence_regions(spark, out).collect()
    }
    assert got == {"chr1": 5000, "chr2": 900}
    # fixture directives parse too (g26's bound source)
    hs = {
        r["contig"]: r["contig_end"]
        for r in read_sequence_regions(
            spark,
            str(Path(FIXTURE).parent / "annotation_hiseq.gff3"),
        ).collect()
    }
    assert hs == {"chr1": 6000000}


def test_gzip_and_directory_read(spark, tmp_path):
    """gzip GFFs decompress through the native text reader, and a
    directory of files reads as one frame — both for free from the
    splittable text scan."""
    import gzip as _gzip

    d = tmp_path / "ann"
    d.mkdir()
    text = Path(FIXTURE).read_text().splitlines(keepends=True)
    half = len(text) // 2
    (d / "a.gff3").write_text("".join(text[:half]))
    with _gzip.open(d / "b.gff3.gz", "wt") as fh:
        fh.write("".join(text[half:]))
    whole = GffSource().read(spark, FIXTURE)
    split = GffSource().read(spark, str(d))
    assert sorted(map(str, split.collect())) == sorted(map(str, whole.collect()))


def test_annotation_fixture_fresh():
    """The committed fixture must be exactly what the generator produces —
    a drifted fixture would silently anchor g25's oracle to stale data."""
    import tools.build_annotation_fixture as gen

    assert gen.build() == Path(FIXTURE).read_text()


def test_g25_plan_codegen_broadcast(spark):
    df = QUERIES["g25_gff_gene_model"].build(spark, "ignored")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan  # parse is pure codegen, no Python row path

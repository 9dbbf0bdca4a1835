"""End-to-end variants pipeline: real BGZF VCF → multi-allelic split
(bcftools norm -m-) → indexed single-file BCF → interval read-back →
site-class aggregation — the composed path a production variants store runs,
crossing the text parser, the normalizer and the binary codec in one flow."""

from __future__ import annotations

from disq_original_spark.operators.variants import split_multiallelics
from disq_original_spark.sources.bcf import BcfSink, BcfSource
from disq_original_spark.sources.headers import read_vcf_header_text
from disq_original_spark.sources.vcf import VcfSource

HISEQ = "/root/reference/src/test/resources/HiSeq.10000.vcf.bgz"


def test_vcf_normalize_bcf_interval_pipeline(spark, tmp_path):
    import pyspark.sql.functions as F

    hdr = read_vcf_header_text(HISEQ)
    v = VcfSource().read(spark, HISEQ)
    extra = (
        v.filter(F.size("alts") > 1)
        .agg(F.sum(F.size("alts") - 1))
        .collect()[0][0]
        or 0
    )
    split = split_multiallelics(v, hdr)
    # norm -m-: one record per (site, alt); bi-allelics pass through
    assert split.count() == v.count() + extra

    out = str(tmp_path / "norm.bcf")
    BcfSink().write(split, hdr, out, write_index=True)

    # indexed interval read-back must equal the in-memory filter
    iv = [("chr1", 1, 500_000)]
    from disq_original_spark.sources.vcf import VARIANTS_COLUMNS, variant_end

    back = BcfSource().read(spark, out, intervals=iv)
    spanned = back.withColumn(
        "end_", variant_end(F.col("info"), F.col("pos"), F.col("ref"))
    )
    got = (
        spanned.filter((F.col("pos") <= 500_000) & (F.col("end_") >= 1))
        .select(*VARIANTS_COLUMNS)
    )
    want = split.filter(F.col("pos") <= 500_000)
    assert got.count() == want.count() > 0

    # every record is now bi-allelic — the normalizer's contract survived
    # the codec
    assert back.filter(F.size("alts") > 1).count() == 0
    # site-class aggregation over the read-back
    classes = (
        back.withColumn(
            "cls",
            F.when(
                (F.length("ref") == 1)
                & (F.length(F.element_at("alts", 1)) == 1),
                "snp",
            ).otherwise("indel"),
        )
        .groupBy("cls")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in classes) == got.count()
    assert "snp" in {r["cls"] for r in classes}

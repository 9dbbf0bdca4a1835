"""Storage facades: format/cardinality resolution from the path
(reference HtsjdkReadsRddStorage / HtsjdkVariantsRddStorage surface)."""

from __future__ import annotations

from pathlib import Path

import pytest

from disq_original_spark.storage import ReadsStorage, VariantsStorage

RES = Path("/root/reference/src/test/resources")
BAM = str(RES / "1.bam")
SAM = str(RES / "test.sam")
CRAM = str(RES / "valid.cram")
FASTA = str(RES / "valid.fasta")
VCF = str(RES / "test.vcf")


def test_reads_format_resolution(spark):
    st = ReadsStorage(spark)
    assert st.read(BAM).count() == 4917
    assert st.read(SAM).count() > 0
    assert ReadsStorage(spark, reference_path=FASTA).read(CRAM).count() == 8


def test_reads_write_resolution(spark, tmp_path):
    st = ReadsStorage(spark, reference_path=FASTA)
    df = st.read(CRAM)
    hdr = st.read_header(CRAM)
    for target in ["out.sam", "out.bam", "out.cram", "out.bam.sharded", "out.sam.sharded"]:
        out = str(tmp_path / target)
        st.write(df, out, hdr)
        assert st.read(out).count() == 8, target


def test_reads_interval_residual_on_cram(spark):
    st = ReadsStorage(spark, reference_path=FASTA)
    iv = spark.createDataFrame([("chr7", 1, 100)], "contig string, start long, end long")
    got = st.read(CRAM, intervals=iv)
    assert 0 < got.count() < 8
    both = st.read(CRAM, intervals=iv, include_unplaced=True)
    assert both.count() == got.count() + 1


def test_bad_extension_rejected(spark):
    with pytest.raises(ValueError, match="infer"):
        ReadsStorage(spark).read("/tmp/what.txt")


def test_variants_storage_roundtrip(spark, tmp_path):
    st = VariantsStorage(spark)
    df = st.read(VCF)
    hdr = st.read_header(VCF)
    out = str(tmp_path / "o.vcf")
    st.write(df, out, hdr)
    assert st.read(out).count() == df.count()
    out2 = str(tmp_path / "o.vcf.sharded")
    st.write(df, out2, hdr)
    assert st.read(out2).count() == df.count()


def test_storage_facade_column_pruning(spark, tmp_path):
    """ReadsStorage.read(columns=...) forwards decode-level pruning to the
    binary sources and projects the text formats; values match the full
    read's subset on every format the facade serves."""
    st = ReadsStorage(spark, reference_path=FASTA)
    for path in (BAM, SAM, CRAM):
        full = st.read(path)
        pruned = st.read(path, columns=["flag", "rname", "pos"])
        assert pruned.columns == ["flag", "rname", "pos"], path
        assert sorted(map(str, pruned.collect())) == sorted(
            map(str, full.select("flag", "rname", "pos").collect())
        ), path


def test_variants_storage_column_pruning(spark, tmp_path):
    """VariantsStorage.read(columns=...): plain projection on the VCF text
    scan, block-granular decode pruning through BcfSource — both value-
    match the full read's subset, and unknown columns fail loud."""
    st = VariantsStorage(spark)
    hdr = st.read_header(VCF)
    df = st.read(VCF)
    bcf = str(tmp_path / "o.bcf")
    st.write(df, bcf, hdr)
    for path in (VCF, bcf):
        full = st.read(path).select("contig", "pos", "qual").collect()
        pruned = st.read(path, columns=["contig", "pos", "qual"])
        assert pruned.columns == ["contig", "pos", "qual"], path
        assert sorted(map(str, pruned.collect())) == sorted(map(str, full)), path
    with pytest.raises(ValueError, match="unknown variants columns"):
        st.read(VCF, columns=["contig", "nope"])

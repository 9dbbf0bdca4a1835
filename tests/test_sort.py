"""Distributed coordinate sort (operators/sort.py) — the samtools-sort
equivalent: scramble a real BAM, range-partition sort it, commit a
single-file BAM with a write-time .bai, and verify global sortedness,
content preservation, and index-pruned interval parity."""

from __future__ import annotations

from pathlib import Path

from disq_original_spark.operators.sort import (
    contig_rank_col,
    coordinate_sort,
    set_sort_order,
)
from disq_original_spark.sources.bam import BamSink, BamSource
from disq_original_spark.sources.headers import read_bam_header

BAM = "/root/reference/src/test/resources/1.bam"


def test_coordinate_sort_restores_global_order(spark, tmp_path):
    import pyspark.sql.functions as F

    header, _refs, _ = read_bam_header(BAM)
    df = BamSource().read(spark, BAM, split_size=128 * 1024)
    # scramble deterministically across 8 partitions
    scrambled = df.repartition(8, F.md5("qname"))
    srt = coordinate_sort(scrambled, header, num_partitions=4)

    out = str(tmp_path / "sorted.bam")
    BamSink().write(srt, set_sort_order(header, "coordinate"), out, write_sbi=True, write_bai=True)

    again = BamSource().read(spark, out, split_size=96 * 1024)
    rows = again.select("rname", "pos").collect()
    order = {name: i for i, (name, _l) in enumerate(header.contigs)}
    keys = [(order.get(r["rname"], len(order)), r["pos"]) for r in rows]
    # file order == coordinate order, across every split boundary
    assert keys == sorted(keys)
    assert again.count() == df.count()
    hdr2, _, _ = read_bam_header(out)
    assert hdr2.sort_order == "coordinate"
    assert Path(out + ".bai").exists()

    # the write-time .bai over the freshly sorted file must prune correctly
    intervals = spark.createDataFrame(
        [("1", 24_795_000, 24_800_000)], "contig string, start long, end long"
    )
    pruned = BamSource().read(spark, out, intervals=intervals)
    assert pruned.count() > 0
    # pruned read over the sorted copy equals the same interval read over
    # the ORIGINAL file — content-identical corpora must agree
    orig = BamSource().read(spark, BAM, intervals=intervals, split_size=128 * 1024)
    got = {r["qname"] for r in pruned.select("qname").collect()}
    assert got == {r["qname"] for r in orig.select("qname").collect()}


def test_contig_rank_unmapped_last(spark):
    header, _refs, _ = read_bam_header(BAM)
    df = spark.createDataFrame(
        [(header.contigs[0][0],), (None,), ("absent_contig",)], "rname string"
    )
    ranks = [r[0] for r in df.select(contig_rank_col(header)).collect()]
    n = len(header.contigs)
    assert ranks == [0, n, n]


def test_set_sort_order_adds_hd_line():
    from disq_original_spark.sources.headers import SamHeader

    h = SamHeader(text="@SQ\tSN:c1\tLN:100\n", contigs=[("c1", 100)])
    out = set_sort_order(h, "coordinate")
    assert out.text.startswith("@HD") and "SO:coordinate" in out.text
    h2 = SamHeader(text="@HD\tVN:1.6\tSO:queryname\n", contigs=[])
    assert "SO:coordinate" in set_sort_order(h2).text


def test_coordinate_sort_vcf_feeds_indexed_sink(spark, tmp_path):
    """The same sort operator drives the VCF side: scramble the real BGZF
    VCF, coordinate_sort on (contig, pos), single-file-commit with a
    write-time .tbi, and the output reads back in global coordinate order
    with interval parity against the original file."""
    import pyspark.sql.functions as F

    from disq_original_spark.sources.headers import SamHeader
    from disq_original_spark.sources.vcf import VcfSink, VcfSource

    HISEQ = "/root/reference/src/test/resources/HiSeq.10000.vcf.bgz"
    src = VcfSource()
    df = src.read(spark, HISEQ, split_size=128 * 1024)
    header_text = src.read_header(HISEQ)
    contigs = sorted({r["contig"] for r in df.select("contig").distinct().collect()})
    pseudo = SamHeader(text="", contigs=[(c, 0) for c in contigs])

    scrambled = df.repartition(8, F.md5(F.col("id").cast("string")))
    srt = coordinate_sort(
        scrambled, pseudo, num_partitions=3, contig_col="contig", pos_col="pos"
    )
    out = str(tmp_path / "sorted.vcf.bgz")
    VcfSink().write(srt, header_text, out, write_index=True)

    again = src.read(spark, out, split_size=96 * 1024)
    order = {c: i for i, c in enumerate(contigs)}
    keys = [(order[r["contig"]], r["pos"]) for r in again.select("contig", "pos").collect()]
    assert keys == sorted(keys)
    assert again.count() == df.count()

    intervals = spark.createDataFrame(
        [("chr1", 2_700_000, 2_800_000)], "contig string, start long, end long"
    )
    got = {
        (r["contig"], r["pos"])
        for r in src.read(spark, out, intervals=intervals).collect()
    }
    want = {
        (r["contig"], r["pos"])
        for r in src.read(spark, HISEQ, intervals=intervals, split_size=128 * 1024).collect()
    }
    assert got == want and len(got) > 0

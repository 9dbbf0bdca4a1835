"""The composed genomics pipeline a GATK user actually runs — read →
MarkDuplicates → coordinate sort → indexed single-file write → read back —
as ONE DataFrame program through this engine's operators and sinks.  This
is the workload the reference exists to enable (MarkDuplicatesSpark runs
through disq readers/writers); here the whole chain is native."""

from __future__ import annotations

import pytest

from disq_original_spark.operators.dupmark import mark_duplicates
from disq_original_spark.operators.sort import coordinate_sort, set_sort_order
from disq_original_spark.sources.bam import BamSink, BamSource
from disq_original_spark.sources.headers import read_bam_header

FIXTURE = "/root/reference/src/test/resources/1.bam"


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    header, _refs, _fv = read_bam_header(FIXTURE)
    reads = BamSource().read(spark, FIXTURE, split_size=256 * 1024)
    marked = mark_duplicates(reads, header).drop("is_duplicate")
    sorted_reads = coordinate_sort(marked, header, num_partitions=4)
    out = str(tmp_path_factory.mktemp("pipeline") / "marked.sorted.bam")
    BamSink().write(sorted_reads, set_sort_order(header), out, write_bai=True)
    return out, header


def test_pipeline_preserves_reads_and_marks(spark, pipeline_out):
    out, _header = pipeline_out
    back = BamSource().read(spark, out)
    orig = BamSource().read(spark, FIXTURE)
    assert back.count() == orig.count() == 4917
    # the file round-trips the fresh duplicate marking (990 at build time)
    n_dups = back.filter("flag & 1024 != 0").count()
    assert 885 <= n_dups <= 1100
    # record identity is preserved end-to-end (flags differ only in 0x400)
    key = ["qname", "flag & 64511 as f", "pos", "cigar"]  # 64511 = 0xFFFF & ~0x400
    assert (
        back.selectExpr(*key).exceptAll(orig.selectExpr(*key)).count() == 0
    )


def test_pipeline_output_is_coordinate_sorted(spark, pipeline_out):
    out, header = pipeline_out
    rows = BamSource().read(spark, out).select("rname", "pos").collect()
    rank = {name: i for i, (name, _l) in enumerate(header.contigs)}
    keys = [(rank.get(r.rname, len(rank)), r.pos) for r in rows]
    assert keys == sorted(keys)
    hdr = BamSource().read_header(out)
    assert "SO:coordinate" in hdr.text.splitlines()[0]


def test_pipeline_bai_serves_interval_reads(spark, pipeline_out):
    out, _header = pipeline_out
    iv = spark.createDataFrame(
        [("1", 24795000, 24800000)], "contig string, start long, end long"
    )
    pruned = BamSource().read(spark, out, intervals=iv).count()
    full = (
        BamSource()
        .read(spark, out)
        .filter("rname = '1' AND pos <= 24800000")
        .filter("pos + 80 >= 24795000")  # 76M reads: end ~ pos+75
        .count()
    )
    assert pruned > 0
    # the indexed read must return every read the naive filter finds
    # (interval semantics use alignment end, so allow exact match only)
    got = {
        (r.qname, r.flag)
        for r in BamSource().read(spark, out, intervals=iv).select("qname", "flag").collect()
    }
    assert len(got) == pruned

"""Large generated-file differential tests — the sandbox analog of the
reference's real-world integration suite (`RealWorldFilesIT.java:21-93`,
README.md:234-247), which validates multi-GB GATK files the container does
not have.  Instead, the repo's own writers synthesize >=100 MB BAM and BGZF
VCF inputs with md5-derived (incompressible-ish) payloads, and the readers
must agree with themselves across three split sizes and with an independent
overlap oracle — the statistical regime where block-boundary and
record-boundary bugs that ~600 KB fixtures cannot surface actually appear.

Opt-in: `pytest -m slow tests/test_realworld_slow.py` (excluded by the
default `-m "not slow"` in pytest.ini — generation + reads take minutes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

_MB = 1024 * 1024
# split sizes chosen to tile a ~100 MB file into many/few/one task(s), with
# a prime-ish size so boundaries land mid-block
_SPLIT_SIZES = [5_000_003, 16 * _MB, 192 * _MB]

_BAM_ROWS = int(os.environ.get("SPARK_GRAFT_SLOW_BAM_ROWS", "850000"))
_VCF_ROWS = int(os.environ.get("SPARK_GRAFT_SLOW_VCF_ROWS", "1600000"))
_CRAM_ROWS = int(os.environ.get("SPARK_GRAFT_SLOW_CRAM_ROWS", "780000"))
_SEQ_LEN = 150

_HEX_TO_ACGT = ("0123456789abcdef", "ACGTACGTACGTACGT")
_HEX_TO_QUAL = ("0123456789abcdef", "IJKLMNOPQRSTUVWX")


def _hexpile(seed: str) -> str:
    """~128 hex chars of per-row md5 material as a SQL expression."""
    parts = ", ".join(
        f"md5(cast(id * {p} + {i} as string) || '{seed}')"
        for i, p in enumerate((1, 31, 1009, 7919))
    )
    return f"concat({parts})"


def _synth_reads(spark, n_rows: int):
    """(reads DataFrame, per-contig row count): 4 contigs, 25-base stride,
    md5-derived (incompressible-ish) seq/qual — shared by the BAM and CRAM
    fixtures so both formats see the same statistical regime."""
    per = n_rows // 4
    return (
        spark.range(0, n_rows, 1, 8).selectExpr(
            "concat('r', cast(id as string)) AS qname",
            "cast(0 AS int) AS flag",
            f"concat('chr', cast(1 + id div {per} AS string)) AS rname",
            f"cast(1 + (id % {per}) * 25 AS bigint) AS pos",
            "cast(60 AS int) AS mapq",
            f"'{_SEQ_LEN}M' AS cigar",
            "cast(NULL AS string) AS rnext",
            "cast(0 AS bigint) AS pnext",
            "cast(0 AS bigint) AS tlen",
            # two hexpiles (256 chars) so seq/qual genuinely cover the
            # 150M cigar — the CRAM feature diff walks all 150 bases
            f"substr(translate(concat({_hexpile('s')}, {_hexpile('s2')}), "
            f"'{_HEX_TO_ACGT[0]}', '{_HEX_TO_ACGT[1]}'), 1, {_SEQ_LEN}) AS seq",
            f"substr(translate(concat({_hexpile('q')}, {_hexpile('q2')}), "
            f"'{_HEX_TO_QUAL[0]}', '{_HEX_TO_QUAL[1]}'), 1, {_SEQ_LEN}) AS qual",
            "map() AS attributes",
        ),
        per,
    )


@pytest.fixture(scope="module")
def big_bam(spark, tmp_path_factory):
    from disq_original_spark.sources.bam import BamSink
    from disq_original_spark.sources.headers import SamHeader

    reads, per = _synth_reads(spark, _BAM_ROWS)
    max_pos = per * 25 + _SEQ_LEN + 10
    header = SamHeader.parse(
        "@HD\tVN:1.6\tSO:coordinate\n"
        + "".join(f"@SQ\tSN:chr{i}\tLN:{max_pos}\n" for i in range(1, 5))
    )
    out = str(tmp_path_factory.mktemp("realworld") / "big.bam")
    BamSink().write(reads, header, out, write_bai=True, write_sbi=True)
    if _BAM_ROWS >= 850000:  # env knob may shrink the run for smoke tests
        assert os.path.getsize(out) >= 100 * _MB, os.path.getsize(out)
    return out, header


@pytest.fixture(scope="module")
def big_vcf(spark, tmp_path_factory):
    from disq_original_spark.sources.vcf import VcfSink

    per = _VCF_ROWS // 4
    variants = spark.range(0, _VCF_ROWS, 1, 8).selectExpr(
        f"concat('chr', cast(1 + id div {per} AS string)) AS contig",
        f"cast(1 + (id % {per}) * 7 AS bigint) AS pos",
        "cast(NULL AS string) AS id",
        "'A' AS ref",
        "array('C') AS alts",
        "cast(50.0 AS double) AS qual",
        "cast(array() AS array<string>) AS filters",
        f"map('K1', md5(cast(id AS string)), 'K2', md5(cast(id * 31 AS string)), "
        f"'K3', md5(cast(id * 1009 AS string))) AS info",
        "array(named_struct('sample', 's1', 'gt', '0/1', "
        "  'attrs', map('GT', '0/1', 'DP', cast(id % 97 AS string))), "
        "named_struct('sample', 's2', 'gt', '1/1', "
        "  'attrs', map('GT', '1/1', 'DP', cast(id % 89 AS string)))) AS genotypes",
    )
    header = (
        "##fileformat=VCFv4.2\n"
        + "".join(f"##contig=<ID=chr{i}>\n" for i in range(1, 5))
        + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2\n"
    )
    out = str(tmp_path_factory.mktemp("realworld") / "big.vcf.bgz")
    VcfSink().write(variants, header, out, write_index=True)
    if _VCF_ROWS >= 1600000:  # env knob may shrink the run for smoke tests
        assert os.path.getsize(out) >= 100 * _MB, os.path.getsize(out)
    return out


def _bam_checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum("pos").alias("sp"),
        F.sum(F.crc32(F.col("qname"))).alias("cq"),
        F.sum(F.crc32(F.col("seq"))).alias("cs"),
    ).first()


def test_bam_split_invariance_at_scale(spark, big_bam):
    """Counts AND content checksums identical across three split sizes: a
    guesser false positive/negative or a split-boundary duplicate/drop at
    ANY of ~1000 block boundaries changes the checksum."""
    from disq_original_spark.sources.bam import BamSource

    path, _header = big_bam
    sums = {
        ss: _bam_checksum(BamSource().read(spark, path, split_size=ss))
        for ss in _SPLIT_SIZES
    }
    base = sums[_SPLIT_SIZES[0]]
    assert base["n"] == _BAM_ROWS
    for ss, s in sums.items():
        assert tuple(s) == tuple(base), ss


def test_bam_interval_parity_at_scale(spark, big_bam):
    """Indexed interval reads (BAI byte-range pruning) must agree with the
    brute-force overlap predicate on the full scan, at two split sizes."""
    from disq_original_spark.sources.bam import BamSource

    path, _header = big_bam
    per = _BAM_ROWS // 4
    lo, hi = per // 2 * 25, per // 2 * 25 + 500_000
    intervals = spark.createDataFrame(
        [("chr2", lo, hi)], "contig string, start long, end long"
    )
    full = BamSource().read(spark, path, split_size=_SPLIT_SIZES[1])
    # every read is 150M ⇒ reference span [pos, pos+149]
    expected = full.filter(
        (F.col("rname") == "chr2")
        & (F.col("pos") <= hi)
        & (F.col("pos") + _SEQ_LEN - 1 >= lo)
    ).count()
    assert expected > 0
    for ss in _SPLIT_SIZES[:2]:
        got = BamSource().read(spark, path, intervals=intervals, split_size=ss)
        assert got.count() == expected, ss


def test_bam_roundtrip_at_scale(spark, big_bam, tmp_path):
    """read → write → read preserves count + content checksum."""
    from disq_original_spark.sources.bam import BamSink, BamSource

    path, header = big_bam
    df = BamSource().read(spark, path, split_size=_SPLIT_SIZES[1])
    out = str(tmp_path / "rt.bam")
    BamSink().write(df, header, out)
    back = BamSource().read(spark, out, split_size=_SPLIT_SIZES[0])
    assert tuple(_bam_checksum(back)) == tuple(_bam_checksum(df))


def _vcf_checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.sum("pos").alias("sp"),
        F.sum(F.crc32(F.try_element_at("info", F.lit("K1")))).alias("ck"),
        F.sum(F.crc32(F.element_at("genotypes", 2)["attrs"]["DP"])).alias("cd"),
    ).first()


def test_vcf_bgzf_split_invariance_at_scale(spark, big_vcf):
    from disq_original_spark.sources.vcf import VcfSource

    sums = {
        ss: _vcf_checksum(VcfSource().read(spark, big_vcf, split_size=ss))
        for ss in _SPLIT_SIZES
    }
    base = sums[_SPLIT_SIZES[0]]
    assert base["n"] == _VCF_ROWS
    for ss, s in sums.items():
        assert tuple(s) == tuple(base), ss


def test_vcf_interval_parity_at_scale(spark, big_vcf):
    """Tabix-pruned interval reads must agree with the brute-force position
    predicate on the full scan, at two split sizes."""
    from disq_original_spark.sources.vcf import VcfSource

    per = _VCF_ROWS // 4
    lo, hi = per // 3 * 7, per // 3 * 7 + 700_000
    intervals = spark.createDataFrame(
        [("chr3", lo, hi)], "contig string, start long, end long"
    )
    full = VcfSource().read(spark, big_vcf, split_size=_SPLIT_SIZES[1])
    # ref 'A', no INFO/END ⇒ span is [pos, pos]
    expected = full.filter(
        (F.col("contig") == "chr3") & F.col("pos").between(lo, hi)
    ).count()
    assert expected > 0
    for ss in _SPLIT_SIZES[:2]:
        got = VcfSource().read(spark, big_vcf, intervals=intervals, split_size=ss)
        assert got.count() == expected, ss


def test_mark_duplicates_at_scale(spark, big_bam):
    """Duplicate marking over ~1.7M reads: union the big BAM with a
    qname-suffixed copy of itself, so every single-end signature carries
    exactly two fragments with identical scores — the tie-break (lowest
    qname survives) makes the expected marking exact: every copy, and only
    the copies, are duplicates."""
    from disq_original_spark.operators.dupmark import mark_duplicates
    from disq_original_spark.sources.bam import BamSource

    path, header = big_bam
    reads = BamSource().read(spark, path, split_size=8 * _MB)
    n = reads.count()
    doubled = reads.union(
        reads.withColumn("qname", F.concat(F.col("qname"), F.lit("x")))
    )
    marked = mark_duplicates(doubled, header).cache()
    try:
        assert marked.filter("is_duplicate").count() == n
        assert marked.filter("is_duplicate AND qname NOT LIKE '%x'").count() == 0
        assert marked.filter("NOT is_duplicate").count() == n
    finally:
        marked.unpersist()


@pytest.fixture(scope="module")
def big_cram(spark, tmp_path_factory):
    """>=100 MB CRAM written by the repo's own sink with a write-time .crai
    (`RealWorldFilesIT.java:21-93` walks CRAM alongside BAM/SAM/VCF).  The
    reference FASTA is all-'A', so every md5-derived base that is not 'A'
    becomes a substitution feature — the features + verbatim quals keep the
    containers incompressible-ish like a real mismatch-rich callset."""
    from disq_original_spark.sources.cram import CramSink

    reads, per = _synth_reads(spark, _CRAM_ROWS)
    max_pos = per * 25 + _SEQ_LEN + 10
    ref_dir = tmp_path_factory.mktemp("ref")
    fasta = str(ref_dir / "ref.fa")
    line = 70
    with open(fasta, "w") as fh:
        for i in range(1, 5):
            fh.write(f">chr{i}\n")
            for off in range(0, max_pos, line):
                fh.write("A" * min(line, max_pos - off) + "\n")
    with open(fasta + ".fai", "w") as fh:
        offset = 0
        for i in range(1, 5):
            offset += len(f">chr{i}\n")
            fh.write(f"chr{i}\t{max_pos}\t{offset}\t{line}\t{line + 1}\n")
            offset += max_pos + (max_pos + line - 1) // line  # bases + newlines
    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:chr{i}\tLN:{max_pos}\n" for i in range(1, 5)
    )
    out = str(tmp_path_factory.mktemp("realworld") / "big.cram")
    CramSink().write(reads, header_text, out, reference_path=fasta, write_index=True)
    if _CRAM_ROWS >= 780000:  # env knob may shrink the run for smoke tests
        assert os.path.getsize(out) >= 100 * _MB, os.path.getsize(out)
    assert os.path.exists(out + ".crai")
    return out, fasta


def test_cram_split_invariance_at_scale(spark, big_cram):
    """Counts AND content checksums identical across three split sizes:
    a container-boundary snap error or a dropped/duplicated container at
    ANY of the ~hundreds of container boundaries changes the checksum."""
    from disq_original_spark.sources.cram import CramSource

    path, fasta = big_cram
    sums = {
        ss: _bam_checksum(
            CramSource().read(spark, path, reference_path=fasta, split_size=ss)
        )
        for ss in _SPLIT_SIZES
    }
    base = sums[_SPLIT_SIZES[0]]
    assert base["n"] == _CRAM_ROWS
    for ss, s in sums.items():
        assert tuple(s) == tuple(base), ss


def test_cram_interval_parity_at_scale(spark, big_cram):
    """.crai-pruned interval reads must agree with the brute-force overlap
    predicate on the full scan, at two split sizes — and must actually
    prune (fewer decode tasks than the full scan)."""
    from pyspark.sql import functions as F

    from disq_original_spark.sources.cram import CramSource

    path, fasta = big_cram
    per = _CRAM_ROWS // 4
    lo, hi = per // 2 * 25, per // 2 * 25 + 400_000
    intervals = spark.createDataFrame(
        [("chr2", lo, hi)], "contig string, start long, end long"
    )
    full = CramSource().read(
        spark, path, reference_path=fasta, split_size=_SPLIT_SIZES[1]
    )
    # every read is 150M => reference span [pos, pos+149]
    expected = full.filter(
        (F.col("rname") == "chr2")
        & (F.col("pos") <= hi)
        & (F.col("pos") + _SEQ_LEN - 1 >= lo)
    ).count()
    assert expected > 0
    for ss in _SPLIT_SIZES[:2]:
        got = CramSource().read(
            spark, path, reference_path=fasta, intervals=intervals, split_size=ss
        )
        assert got.count() == expected, ss
    if _CRAM_ROWS >= 780000:  # pruning only observable with many containers
        pruned = CramSource().read(
            spark, path, reference_path=fasta, intervals=intervals,
            split_size=_SPLIT_SIZES[0],
        )
        full_small = CramSource().read(
            spark, path, reference_path=fasta, split_size=_SPLIT_SIZES[0]
        )
        assert (
            pruned.rdd.getNumPartitions() < full_small.rdd.getNumPartitions() / 2
        ), (pruned.rdd.getNumPartitions(), full_small.rdd.getNumPartitions())


@pytest.fixture(scope="module")
def big_cram31(spark, tmp_path_factory):
    """Multi-container CRAM **3.1** written by the repo's own sink — rANS
    Nx16 externals (with RLE candidates), order-1 quality model, tok3
    read names.  Rows are reduced vs the 3.0 fixture: the pure-Python
    3.1 entropy coders dominate build time, and container-boundary
    coverage needs dozens of containers, not hundreds of MB."""
    from disq_original_spark.sources.cram import CramSink

    rows = max(20_000, _CRAM_ROWS // 12)
    reads, per = _synth_reads(spark, rows)
    max_pos = per * 25 + _SEQ_LEN + 10
    ref_dir = tmp_path_factory.mktemp("ref31")
    fasta = str(ref_dir / "ref.fa")
    line = 70
    with open(fasta, "w") as fh:
        for i in range(1, 5):
            fh.write(f">chr{i}\n")
            for off in range(0, max_pos, line):
                fh.write("A" * min(line, max_pos - off) + "\n")
    with open(fasta + ".fai", "w") as fh:
        offset = 0
        for i in range(1, 5):
            offset += len(f">chr{i}\n")
            fh.write(f"chr{i}\t{max_pos}\t{offset}\t{line}\t{line + 1}\n")
            offset += max_pos + (max_pos + line - 1) // line
    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:chr{i}\tLN:{max_pos}\n" for i in range(1, 5)
    )
    out = str(tmp_path_factory.mktemp("realworld31") / "big31.cram")
    CramSink().write(
        reads, header_text, out, reference_path=fasta, version=(3, 1),
        write_index=True,
    )
    with open(out, "rb") as fh:
        magic = fh.read(6)
    assert (magic[4], magic[5]) == (3, 1)
    return out, fasta, rows


def test_cram31_split_invariance_at_scale(spark, big_cram31):
    """The 3.1 read path (Nx16 + tok3 blocks) under the same
    container-boundary stress as the 3.0 fixture: counts AND content
    checksums identical across three split sizes."""
    from disq_original_spark.sources.cram import CramSource

    path, fasta, rows = big_cram31
    sizes = [1_000_003, 4 * _MB, 64 * _MB]  # the 3.1 fixture is smaller
    sums = {
        ss: _bam_checksum(
            CramSource().read(spark, path, reference_path=fasta, split_size=ss)
        )
        for ss in sizes
    }
    base = sums[sizes[0]]
    assert base["n"] == rows
    for ss, s in sums.items():
        assert tuple(s) == tuple(base), ss


# --------------------------------------------------- write-side commit tests
# VERDICT r9 task #8: the read path proves itself on >100 MB files; these
# pin the WRITER-COMMIT path (parallel concatenation-closed parts + concat)
# at the same scale — the same rows written through the single-file sinks
# at two different partitionings must produce content-identical files,
# each re-read through the distributed source at two split sizes.


def test_bam_single_file_write_commit_at_scale(spark, big_bam, tmp_path):
    """>100 MB BAM written via the single-file sink with 3-part and
    64-part concats: every (partitioning, re-read split size) combination
    must reproduce the source content checksum exactly."""
    from disq_original_spark.sources.bam import BamSink, BamSource

    path, header = big_bam
    df = BamSource().read(spark, path, split_size=_SPLIT_SIZES[1])
    want = tuple(_bam_checksum(df))
    for parts in (3, 64):
        out = str(tmp_path / f"commit{parts}.bam")
        BamSink().write(df.repartition(parts, "qname"), header, out)
        if _BAM_ROWS >= 850000:
            assert os.path.getsize(out) >= 100 * _MB, os.path.getsize(out)
        for ss in _SPLIT_SIZES[:2]:
            back = BamSource().read(spark, out, split_size=ss)
            assert tuple(_bam_checksum(back)) == want, (parts, ss)


@pytest.fixture(scope="module")
def big_cram31_write(spark, tmp_path_factory):
    """>100 MB CRAM 3.1 single-file write: the synthetic reads mismatch
    the all-A reference at most positions, so nearly every base travels
    as an X/B feature — the worst case for both the feature differ and
    the rANS Nx16/tok3 encoders, which is exactly what a writer-commit
    test at scale should pay.  Row count sized so the committed file
    crosses 100 MB (features cost more bytes than BAM's packed seq)."""
    from disq_original_spark.sources.cram import CramSink

    # sizing: the 3.1 codecs compress the all-mismatch feature streams to
    # ~118 bytes/read (measured), so crossing 100 MB needs ~890K reads
    rows = max(20_000, (_CRAM_ROWS * 5) // 4)
    reads, per = _synth_reads(spark, rows)
    max_pos = per * 25 + _SEQ_LEN + 10
    ref_dir = tmp_path_factory.mktemp("ref31w")
    fasta = str(ref_dir / "ref.fa")
    line = 70
    with open(fasta, "w") as fh:
        for i in range(1, 5):
            fh.write(f">chr{i}\n")
            for off in range(0, max_pos, line):
                fh.write("A" * min(line, max_pos - off) + "\n")
    with open(fasta + ".fai", "w") as fh:
        offset = 0
        for i in range(1, 5):
            offset += len(f">chr{i}\n")
            fh.write(f"chr{i}\t{max_pos}\t{offset}\t{line}\t{line + 1}\n")
            offset += max_pos + (max_pos + line - 1) // line
    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:chr{i}\tLN:{max_pos}\n" for i in range(1, 5)
    )
    return reads, header_text, fasta, rows


def test_cram31_single_file_write_commit_at_scale(
    spark, big_cram31_write, tmp_path
):
    """>100 MB CRAM 3.1 written via the single-file sink at two input
    partitionings (8-part and 48-part container sets), re-read through
    the distributed source at two split sizes — checksum parity with the
    source rows for all four combinations."""
    from disq_original_spark.sources.cram import CramSink, CramSource

    reads, header_text, fasta, rows = big_cram31_write
    want = tuple(_bam_checksum(reads))
    sizes = [1_000_003, 16 * _MB]
    for parts in (8, 48):
        out = str(tmp_path / f"commit31_{parts}.cram")
        CramSink().write(
            reads.repartition(parts, "qname"), header_text, out,
            reference_path=fasta, version=(3, 1),
        )
        with open(out, "rb") as fh:
            magic = fh.read(6)
        assert (magic[4], magic[5]) == (3, 1)
        if _CRAM_ROWS >= 780000:
            assert os.path.getsize(out) >= 100 * _MB, os.path.getsize(out)
        for ss in sizes:
            back = CramSource().read(
                spark, out, reference_path=fasta, split_size=ss
            )
            assert (
                tuple(_bam_checksum(back)) == want
            ), (parts, ss)

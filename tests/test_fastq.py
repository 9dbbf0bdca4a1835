"""Splittable FASTQ source: exactly-once record tiling across byte splits on
an adversarial corpus (quality lines starting with '@' and '+', multi-word
names), gzip fallback, single-file sink round-trip, malformed-input
fail-loud, and paired-end mate joining."""

from __future__ import annotations

import gzip
import random

import pytest

from disq_original_spark.sources.fastq import (
    FastqSink,
    FastqSource,
    find_record_start,
    pair_up,
)

_BASES = "ACGT"
# Phred+33 alphabet deliberately includes '@' (Q31) and '+' (Q10) so quality
# lines regularly START with the ambiguous characters the guesser must reject
_QUALS = "!\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJ"


def _make_fastq(n: int, seed: int = 7) -> tuple[bytes, list[tuple[str, str, str, str]]]:
    rng = random.Random(seed)
    recs = []
    out = []
    for i in range(n):
        ln = rng.randint(20, 180)
        seq = "".join(rng.choice(_BASES) for _ in range(ln))
        # force a hostile prefix on many quality lines
        q0 = rng.choice("@+" + _QUALS)
        qual = q0 + "".join(rng.choice(_QUALS) for _ in range(ln - 1))
        name = f"read_{i:06d} comment {rng.randint(0, 9)}"
        plus = name if i % 7 == 0 else ""  # '+name' repeats sometimes
        recs.append((name, seq, plus, qual))
        out.append(f"@{name}\n{seq}\n+{plus}\n{qual}\n")
    return "".join(out).encode(), recs


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    data, recs = _make_fastq(2000)
    p = tmp_path_factory.mktemp("fastq") / "reads.fastq"
    p.write_bytes(data)
    return str(p), recs


def test_find_record_start_never_lands_on_quality_line(fastq_file):
    """Exhaustive: from EVERY byte offset the guesser must land on a true
    record boundary (or EOF) — zero false positives on quality lines that
    start with '@'."""
    path, recs = fastq_file
    data = open(path, "rb").read()
    # ground truth: byte offsets of record starts
    truth = []
    off = 0
    for name, seq, plus, qual in recs:
        truth.append(off)
        off += len(f"@{name}\n{seq}\n+{plus}\n{qual}\n".encode())
    truth_set = set(truth)
    import io

    fh = io.BytesIO(data)
    step = 37  # sample offsets densely but affordably
    for start in range(1, len(data), step):
        rs = find_record_start(fh, start, len(data))
        assert rs == len(data) or rs in truth_set, (start, rs)
        # and it is the FIRST boundary at or after start
        nxt = next((t for t in truth if t >= start), len(data))
        assert rs == nxt, (start, rs, nxt)


def test_split_invariance(spark, fastq_file):
    """Same records whatever the split size — exactly-once, no loss, no
    duplication, order-insensitive."""
    path, recs = fastq_file
    expected = sorted(recs)
    for split in (999, 7_001, 64 * 1024, 10**9):
        df = FastqSource().read(spark, path, split_size=split)
        got = sorted(
            (r["name"], r["seq"], r["plus"], r["qual"]) for r in df.collect()
        )
        assert got == expected, f"split_size={split}"


def test_gzip_fallback(spark, tmp_path, fastq_file):
    path, recs = fastq_file
    gz = tmp_path / "reads.fastq.gz"
    gz.write_bytes(gzip.compress(open(path, "rb").read()))
    df = FastqSource().read(spark, str(gz), split_size=4096)
    assert df.count() == len(recs)
    assert df.rdd.getNumPartitions() == 1  # gzip: one task per file


def test_sink_round_trip(spark, tmp_path, fastq_file):
    path, recs = fastq_file
    df = FastqSource().read(spark, path, split_size=8192)
    out = tmp_path / "rt.fastq"
    FastqSink().write(df, str(out))
    back = FastqSource().read(spark, str(out), split_size=8192)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    # byte-level: same multiset of records implies same size
    assert out.stat().st_size == len(open(path, "rb").read())


def test_truncated_record_fails_loud(spark, tmp_path, fastq_file):
    path, _ = fastq_file
    data = open(path, "rb").read()
    bad = tmp_path / "trunc.fastq"
    bad.write_bytes(data[: len(data) - 30])  # cut inside the last record
    with pytest.raises(Exception, match="truncated|length mismatch"):
        FastqSource().read(spark, str(bad), split_size=10**9).collect()


def test_seq_qual_mismatch_fails_loud(spark, tmp_path):
    bad = tmp_path / "mismatch.fastq"
    bad.write_bytes(b"@r1\nACGT\n+\n!!!\n")
    with pytest.raises(Exception, match="length mismatch"):
        FastqSource().read(spark, str(bad)).collect()


def test_pair_up(spark, tmp_path):
    r1p = tmp_path / "r1.fastq"
    r2p = tmp_path / "r2.fastq"
    r1p.write_bytes(b"@p1/1\nAC\n+\n!!\n@p2/1\nGG\n+\n##\n")
    r2p.write_bytes(b"@p1/2\nTG\n+\n$$\n@p2/2\nCC\n+\n%%\n")
    r1 = FastqSource().read(spark, str(r1p))
    r2 = FastqSource().read(spark, str(r2p))
    rows = {r["stem"]: r for r in pair_up(r1, r2).collect()}
    assert set(rows) == {"p1", "p2"}
    assert rows["p1"]["seq_1"] == "AC" and rows["p1"]["seq_2"] == "TG"
    assert rows["p2"]["qual_2"] == "%%"


def test_directory_read(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    total = 0
    for i in range(3):
        data, recs = _make_fastq(50, seed=i)
        (d / f"part-{i}.fastq").write_bytes(data)
        total += len(recs)
    df = FastqSource().read(spark, str(d), split_size=2048)
    assert df.count() == total


def test_bam_to_fastq_matches_python_replay(spark):
    """samtools-fastq semantics replayed row-by-row in Python over the real
    BAM: secondary/supplementary dropped, reverse-strand reverse-
    complemented with reversed qualities, mate suffixes applied."""
    from disq_original_spark.sources.bam import BamSource
    from disq_original_spark.sources.fastq import bam_to_fastq

    bam = "/root/reference/src/test/resources/1.bam"
    reads = BamSource().read(spark, bam)
    got = sorted(
        (r["name"], r["seq"], r["qual"])
        for r in bam_to_fastq(reads).collect()
    )
    comp = str.maketrans("ACGTNacgtn", "TGCANtgcan")
    expected = []
    for r in reads.select("qname", "flag", "seq", "qual").collect():
        if r["flag"] & 0x100 or r["flag"] & 0x800:
            continue
        seq, qual = r["seq"], r["qual"]
        if r["flag"] & 0x10:
            seq = seq.translate(comp)[::-1]
            qual = qual[::-1]
        sfx = "/1" if r["flag"] & 0x40 else ("/2" if r["flag"] & 0x80 else "")
        expected.append((r["qname"] + sfx, seq, qual))
    assert got == sorted(expected)
    assert len(expected) > 0


def test_bam_to_fastq_round_trip_through_sink(spark, tmp_path):
    from disq_original_spark.sources.bam import BamSource
    from disq_original_spark.sources.fastq import FastqSink, FastqSource, bam_to_fastq

    bam = "/root/reference/src/test/resources/1.bam"
    fq = bam_to_fastq(BamSource().read(spark, bam))
    out = tmp_path / "reads.fastq"
    FastqSink().write(fq, str(out))
    back = FastqSource().read(spark, str(out), split_size=64 * 1024)
    a = sorted(map(tuple, fq.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_fastq_tiling_property_random_corpora():
    """Property (pure Python, no Spark): for ANY random corpus over the
    full Phred alphabet and ANY split geometry, the per-split record sets
    partition the corpus — exactly-once, no loss, no duplication."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from disq_original_spark.sources.fastq import _iter_records

    qual_alpha = "".join(chr(c) for c in range(33, 75))  # ! .. J incl @ +

    recs_strategy = st.lists(
        st.tuples(
            st.text(alphabet="abcXYZ019_ ", min_size=1, max_size=12),
            st.integers(min_value=1, max_value=60),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=120, deadline=None)
    @given(recs_strategy, st.randoms())
    def check(specs, rng):
        recs = []
        blob = bytearray()
        for name, ln in specs:
            seq = "".join(rng.choice("ACGT") for _ in range(ln))
            qual = "".join(rng.choice(qual_alpha) for _ in range(ln))
            recs.append((name, seq, "", qual))
            blob += f"@{name}\n{seq}\n+\n{qual}\n".encode()
        data = bytes(blob)
        n_splits = rng.randint(1, 6)
        cuts = sorted(rng.randint(0, len(data)) for _ in range(n_splits - 1))
        bounds = [0] + cuts + [len(data)]
        got = []
        fh = io.BytesIO(data)
        for s, e in zip(bounds, bounds[1:]):
            got.extend(_iter_records(fh, s, e, len(data)))
        assert sorted(got) == sorted(recs)

    check()


def test_fastq_import_to_unaligned_bam_round_trip(spark, tmp_path, fastq_file):
    """samtools-import path: FASTQ → unaligned reads frame → single-file
    BAM → read back; names/seqs/quals and the unmapped/mate flags must
    survive, and the BAM is a valid unaligned file (no coordinates)."""
    from disq_original_spark.sources.bam import BamSink, BamSource
    from disq_original_spark.sources.fastq import fastq_to_reads
    from disq_original_spark.sources.headers import SamHeader

    path, recs = fastq_file
    fq = FastqSource().read(spark, path, split_size=64 * 1024)
    reads = fastq_to_reads(fq)
    header = SamHeader.parse("@HD\tVN:1.6\tSO:unsorted\n")
    out = str(tmp_path / "unaligned.bam")
    BamSink().write(reads, header, out)
    back = BamSource().read(spark, out)
    got = sorted(
        (r["qname"], r["flag"], r["seq"], r["qual"]) for r in back.collect()
    )
    want = sorted(
        (name.split(" ")[0], 4, seq, qual) for name, seq, plus, qual in recs
    )
    assert got == want
    # unaligned convention after the BAM round-trip: no reference, pos 0
    # (the SAM '*'/0 placeholders), '*' cigar
    assert back.filter(
        "rname IS NOT NULL OR coalesce(pos, 0) != 0 OR cigar != '*'"
    ).count() == 0


def test_fastq_import_mate_flags(spark, tmp_path):
    from disq_original_spark.sources.fastq import fastq_to_reads

    p = tmp_path / "p.fastq"
    p.write_bytes(b"@x/1\nAC\n+\n!!\n@x/2\nGT\n+\n##\n@solo\nTT\n+\n%%\n")
    rows = {
        (r["qname"], r["flag"])
        for r in fastq_to_reads(FastqSource().read(spark, str(p))).collect()
    }
    assert rows == {("x", 0x1 | 0x4 | 0x8 | 0x40), ("x", 0x1 | 0x4 | 0x8 | 0x80),
                    ("solo", 0x4)}

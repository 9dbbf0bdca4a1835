"""The reference's interval-traversal matrix, mirrored.

`HtsjdkReadsRddTest.java:168-305` parameterizes 5 traversal cases over
BAM/CRAM/SAM written from a generated 1000-pair file (`AnySamTestUtil`:
pairs at (i+1)*1000 / +100 on chr21, pair #5 replaced by two PLACED
unmapped fragments, two UNPLACED unmapped fragments at EOF), with a 40 KB
split size, checking counts against htsjdk/samtools.  Here the same file
shape is generated through our own sinks, read back through ReadsStorage
with the same traversals, and checked against a brute-force Python count
with htsjdk's overlap semantics (placed-unmapped overlap at their
position; unplaced returned only when the traversal flag is set;
null intervals + flag → unplaced only)."""

from __future__ import annotations

import pytest

from disq_original_spark.sources.headers import SamHeader
from disq_original_spark.storage import ReadsStorage

CHR = "chr21"
CHR_LEN = 1_000_135
READ_LEN = 36
HEADER_TEXT = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{CHR}\tLN:{CHR_LEN}\n"
N_PAIRS = 1000

TWO_INTERVALS = [(CHR, 5000, 9999), (CHR, 20000, 22999)]
WHOLE_CHR = [(CHR, 1, CHR_LEN)]

CASES = [
    (TWO_INTERVALS, False),
    (WHOLE_CHR, False),
    (TWO_INTERVALS, True),
    (None, True),
    ([], True),
]


def _rows() -> list[dict]:
    def rec(qname, flag, rname, pos, cigar, rnext, pnext, tlen):
        return {
            "qname": qname,
            "flag": flag,
            "rname": rname,
            "pos": pos,
            "mapq": 0 if flag & 4 else 60,
            "cigar": cigar,
            "rnext": rnext,
            "pnext": pnext,
            "tlen": tlen,
            "seq": "A" * READ_LEN,
            "qual": "I" * READ_LEN,
            "attributes": {},
        }

    rows = []
    for i in range(N_PAIRS):
        s1, s2 = (i + 1) * 1000, (i + 1) * 1000 + 100
        if i == 5:  # two placed-unmapped fragments instead of a pair
            rows.append(rec(f"test-read-{i:03d}-1", 4, CHR, s1, "*", None, 0, 0))
            rows.append(rec(f"test-read-{i:03d}-2", 4, CHR, s2, "*", None, 0, 0))
        else:
            q = f"test-read-{i:03d}"
            tlen = s2 + READ_LEN - s1
            rows.append(rec(q, 99, CHR, s1, f"{READ_LEN}M", "=", s2, tlen))
            rows.append(rec(q, 147, CHR, s2, f"{READ_LEN}M", "=", s1, -tlen))
    rows.append(rec("test-read-1000-unplaced-unmapped", 4, None, 0, "*", None, 0, 0))
    rows.append(rec("test-read-1001-unplaced-unmapped", 4, None, 0, "*", None, 0, 0))
    return rows


def _is_unplaced(r: dict) -> bool:
    return bool(r["flag"] & 4) and (r["rname"] is None or r["pos"] == 0)


def _expected(rows, intervals, include_unplaced) -> int:
    def end(r):
        return r["pos"] if r["cigar"] == "*" else r["pos"] + READ_LEN - 1

    n = 0
    if intervals is not None:
        for r in rows:
            if _is_unplaced(r):
                continue
            if any(
                r["rname"] == c and r["pos"] <= e and end(r) >= s
                for c, s, e in intervals
            ):
                n += 1
    if include_unplaced:
        n += sum(1 for r in rows if _is_unplaced(r))
    return n


@pytest.fixture(scope="module")
def synth_paths(spark, tmp_path_factory):
    """Write the generated file in all three formats through our sinks."""
    from disq_original_spark.sources.bam import READS_SCHEMA
    from disq_original_spark.sources.sam import READS_COLUMNS

    tmp = tmp_path_factory.mktemp("ivmatrix")
    fasta = tmp / "chr21.fa"
    with open(fasta, "wt") as fh:
        fh.write(f">{CHR}\n" + "A" * CHR_LEN + "\n")
    with open(str(fasta) + ".fai", "wt") as fh:
        fh.write(f"{CHR}\t{CHR_LEN}\t{len(CHR) + 2}\t{CHR_LEN}\t{CHR_LEN + 1}\n")

    rows = _rows()
    df = spark.createDataFrame(
        [tuple(r[c] for c in READS_COLUMNS) for r in rows], READS_SCHEMA
    )
    header = SamHeader.parse(HEADER_TEXT)
    st = ReadsStorage(spark, reference_path=str(fasta))
    paths = {}
    for ext in ("bam", "sam", "cram"):
        out = str(tmp / f"synth.{ext}")
        st.write(df, out, header)
        paths[ext] = out
    return paths, str(fasta), rows


@pytest.mark.parametrize("fmt", ["bam", "sam", "cram"])
@pytest.mark.parametrize("case", range(len(CASES)))
def test_interval_traversal_matrix(spark, synth_paths, fmt, case):
    paths, fasta, rows = synth_paths
    intervals, include_unplaced = CASES[case]
    st = ReadsStorage(spark, reference_path=fasta, split_size=40_000)
    iv_df = (
        None
        if intervals is None
        else spark.createDataFrame(
            intervals or [], "contig string, start long, end long"
        )
    )
    got = st.read(
        paths[fmt], intervals=iv_df, include_unplaced=include_unplaced
    ).count()
    assert got == _expected(rows, intervals, include_unplaced), (fmt, CASES[case])


@pytest.mark.parametrize("fmt", ["bam", "sam", "cram"])
def test_full_read_count_matches_generator(spark, synth_paths, fmt):
    paths, fasta, rows = synth_paths
    st = ReadsStorage(spark, reference_path=fasta, split_size=40_000)
    assert st.read(paths[fmt]).count() == len(rows) == 2 * N_PAIRS + 2


def test_mapped_only_traversal_rejected():
    """Reference contract: null intervals without the unplaced flag is an
    explicit error (`AbstractBinarySamSource.java:50-54`)."""
    from disq_original_spark.operators.interval import interval_filter

    with pytest.raises(ValueError, match="include_unplaced"):
        interval_filter(None, None, include_unplaced=False)

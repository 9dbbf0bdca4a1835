"""Materialize the genomics fixtures' decoded records to parquet so the
driver's DuckDB oracle can hash-check the genomics AGGREGATION math
(VERDICT r4 directive #4).

DuckDB cannot read BAM/VCF/BCF/FASTA, so g03/g04/g06/g07/g09+ were
structurally `no_oracle` — the operator math (flagstat, depth, ts/tv,
ROH...) was only pytest-oracled.  This tool decodes each fixture ONCE and
commits the rows as parquet under fixtures/oracle/; the queries keep
reading the real binary formats through the splittable sources, while
their `oracle_sql()` runs plain SQL over these parquet twins.  Decode
correctness itself stays with the differential pytest suite
(tests/test_bam.py, test_vcf.py, ... pin the sources against reference
fixtures); what the driver rows add is an independent engine re-running
the aggregation logic.

The g13 span table is deliberately an INDEPENDENT Python CIGAR walk (not
the Spark codegen fold at queries/genomic.py::g13), so the span semantics
(M/=/X consume ref+query, D/N consume ref only) are cross-implemented,
not twinned.

Determinism: every frame is sorted on its natural key before writing, so
regeneration produces identical logical content (pinned by
tests/test_genomic_oracle_parquet.py).

Run from the repo root:  python tools/build_oracle_fixtures.py
"""

from __future__ import annotations

import re
import struct
import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = "/root/reference/src/test/resources"
OUT = REPO / "fixtures" / "oracle"

SHARDED_BAM = f"{FIXTURES}/HiSeq.1mb.1RG.2k_lines.alternate.recalibrated.DIQ.sharded.bam"


def _write(name: str, pdf: pd.DataFrame, schema: pa.Schema | None = None) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, OUT / name, compression="zstd")
    print(f"wrote {OUT / name}: {len(pdf)} rows")


def aligned_spans(pos: int, cigar: str) -> list[tuple[int, int]]:
    """Independent CIGAR walk (vs the codegen fold in queries/genomic.py):
    M/=/X emit an aligned [start,end] span and advance the reference
    offset; D/N advance silently; I/S/H/P consume no reference."""
    off, spans = 0, []
    for ln, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar or ""):
        ln = int(ln)
        if op in "M=X":
            spans.append((pos + off, pos + off + ln - 1))
            off += ln
        elif op in "DN":
            off += ln
    return spans


def unclipped_5p(pos: int, flag: int, cigar: str) -> int:
    """Independent unclipped-5' derivation (vs the Catalyst expressions in
    operators/dupmark.py): leading soft+hard clips restored on the forward
    strand, trailing clips past the alignment end on the reverse strand."""
    c = cigar or ""
    ops = re.findall(r"(\d+)([MIDNSHP=X])", c)
    ref_len = sum(int(ln) for ln, op in ops if op in "MDN=X")
    lead = trail = 0
    i = 0
    while i < len(ops) and ops[i][1] in "HS":
        lead += int(ops[i][0])
        i += 1
    j = len(ops) - 1
    while j >= i and ops[j][1] in "HS":
        trail += int(ops[j][0])
        j -= 1
    if flag & 16:  # reverse strand
        return pos + max(ref_len - 1, 0) + trail
    return pos - lead


def base_quality_score(qual: str) -> int:
    """Independent Picard SUM_OF_BASE_QUALITIES (phred >= 15 only)."""
    if qual is None or qual == "*":
        return 0
    return sum(q for q in (ord(ch) - 33 for ch in qual) if q >= 15)


def parse_rg_libraries(header_text: str) -> dict[str, str]:
    """Independent @RG ID -> LB parse of the SAM header text."""
    out: dict[str, str] = {}
    for line in header_text.splitlines():
        if not line.startswith("@RG"):
            continue
        fields = dict(
            tok.split(":", 1) for tok in line.split("\t")[1:] if ":" in tok
        )
        if "ID" in fields and "LB" in fields:
            out[fields["ID"]] = fields["LB"]
    return out


def parse_fasta(path: str) -> list[tuple[str, str]]:
    """Independent FASTA parser (vs sources/fasta.py): (contig, SEQ)."""
    out: list[tuple[str, str]] = []
    name, chunks = None, []
    for line in Path(path).read_text().splitlines():
        if line.startswith(">"):
            if name is not None:
                out.append((name, "".join(chunks).upper()))
            name, chunks = line[1:].split()[0], []
        elif line.strip():
            chunks.append(line.strip())
    if name is not None:
        out.append((name, "".join(chunks).upper()))
    return out


def f32(x: float | None) -> float | None:
    """float32 canonicalization — BCF stores QUAL as IEEE float32, so the
    g23 oracle must compare at float32 precision."""
    if x is None:
        return None
    return struct.unpack("<f", struct.pack("<f", float(x)))[0]


def build_frames(spark) -> dict[str, pd.DataFrame]:
    """Decode every fixture into its deterministic, sorted parquet-twin
    frame.  Shared by main() (writes) and the freshness-guard test
    (tests/test_genomic_oracle_parquet.py re-derives and compares to the
    committed files, so a decoder change forces a fixture regeneration
    instead of silently diverging from the oracles)."""
    from pyspark.sql import functions as F

    from disq_original_spark.operators.variants import promote_info
    from disq_original_spark.sources.bam import BamSource
    from disq_original_spark.sources.headers import read_bam_header, read_vcf_header_text
    from disq_original_spark.sources.vcf import VcfSource

    frames: dict[str, pd.DataFrame] = {}

    # ---- 1.bam reads (g03, g10, g11, g15, g24) + header contig dict (g15)
    reads = (
        BamSource()
        .read(spark, f"{FIXTURES}/1.bam")
        .select(
            "qname", "flag", "rname", "pos", "mapq", "cigar",
            "rnext", "pnext", "tlen", "seq", "qual",
        )
        .toPandas()
        .sort_values(["qname", "flag", "rname", "pos", "cigar"])
        .reset_index(drop=True)
    )
    frames["bam_1_reads.parquet"] = reads

    hdr, seq_dict, _fv = read_bam_header(f"{FIXTURES}/1.bam")
    contigs = pd.DataFrame(
        [(i, name, length) for i, (name, length) in enumerate(seq_dict)]
        + [(len(seq_dict), "*", 0)],
        columns=["rank", "contig", "length"],
    )
    frames["bam_1_contigs.parquet"] = contigs

    # ---- g09 duplicate-marking signatures: the HARD per-read derivations
    # (unclipped 5' position, base-quality score, library) computed by an
    # INDEPENDENT Python implementation; the oracle SQL re-runs the whole
    # Picard grouping/ranking/marking decision over these.
    raw = (
        BamSource()
        .read(spark, f"{FIXTURES}/1.bam")
        .select(
            "qname", "flag", "rname", "pos", "cigar", "qual",
            F.col("attributes")["RG"].alias("rg"),
        )
        .toPandas()
        .sort_values(["qname", "flag", "rname", "pos", "cigar"])
        .reset_index(drop=True)
    )
    libmap = parse_rg_libraries(hdr.text)
    dupsig = raw[["qname", "flag", "rname"]].copy()
    dupsig["upos"] = [
        unclipped_5p(int(p), int(f), c)
        for p, f, c in zip(raw["pos"], raw["flag"], raw["cigar"])
    ]
    dupsig["score"] = [base_quality_score(q) for q in raw["qual"]]
    dupsig["lib"] = [
        "__no_library__" if rg is None else libmap.get(rg, "__no_library__")
        for rg in raw["rg"]
    ]
    frames["bam_1_dupsig.parquet"] = dupsig

    # ---- sharded-BAM reads (g06) + independent aligned spans (g13)
    sharded = (
        BamSource()
        .read(spark, SHARDED_BAM)
        .select("qname", "flag", "rname", "pos", "mapq", "cigar")
        .toPandas()
        .sort_values(["qname", "flag", "pos", "cigar"])
        .reset_index(drop=True)
    )
    frames["bam_sharded_reads.parquet"] = sharded

    eligible = sharded[
        ((sharded["flag"] & (4 + 256 + 2048)) == 0) & sharded["rname"].notna()
    ]
    span_rows = [
        (r.rname, s, e)
        for r in eligible.itertuples()
        for s, e in aligned_spans(int(r.pos), r.cigar)
    ]
    spans = (
        pd.DataFrame(span_rows, columns=["rname", "s", "e"])
        .sort_values(["rname", "s", "e"])
        .reset_index(drop=True)
    )
    frames["bam_sharded_spans.parquet"] = spans

    # ---- HiSeq VCF (g04, g07, g12) + exploded genotypes (g22)
    hiseq_path = f"{FIXTURES}/HiSeq.10000.vcf.bgz"
    hiseq_hdr = read_vcf_header_text(hiseq_path)
    v = VcfSource().read(spark, hiseq_path)
    typed = promote_info(v, hiseq_hdr)
    hiseq = (
        typed.select(
            "contig", "pos", "ref", "alts", "qual", "filters",
            F.col("info_DP").alias("info_dp"),
            F.col("info_MQ").alias("info_mq"),
            F.col("info_DB").alias("info_db"),
            # GQ is declared Number=1 Type=Float in this header — cast to
            # double exactly as promote-style typing does (an int cast
            # would null out decimal values like '1.44')
            F.transform(
                "genotypes", lambda g: g["attrs"]["GQ"].try_cast("double")
            ).alias("gq_list"),
        )
        .toPandas()
        .sort_values(["contig", "pos", "ref"])
        .reset_index(drop=True)
    )
    frames["vcf_hiseq.parquet"] = hiseq

    gt = (
        v.select("contig", "pos", F.explode("genotypes").alias("g"))
        .select("contig", "pos", F.col("g.sample").alias("sample"), F.col("g.gt").alias("gt"))
        .toPandas()
        .sort_values(["contig", "pos", "sample"])
        .reset_index(drop=True)
    )
    frames["vcf_hiseq_gt.parquet"] = gt

    # ---- test.vcf (g14, g23): raw alts/AF/genotypes so the SQL twin
    # performs the multiallelic split arithmetic itself
    tv = VcfSource().read(spark, f"{FIXTURES}/test.vcf")
    test_pdf = (
        tv.select(
            "contig", "pos", "ref", "alts", "qual",
            F.col("info")["AF"].alias("af"),
            F.transform("genotypes", lambda g: g["gt"]).alias("gts"),
            F.size("genotypes").alias("n_genotypes"),
        )
        .toPandas()
        .sort_values(["contig", "pos", "ref"])
        .reset_index(drop=True)
    )
    test_pdf["qual_f32"] = [f32(q) for q in test_pdf["qual"]]
    frames["vcf_test.parquet"] = test_pdf

    # ---- valid.fasta contigs (g19, g20, g21) — independent parser
    seqs = pd.DataFrame(parse_fasta(f"{FIXTURES}/valid.fasta"), columns=["contig", "seq"])
    seqs = seqs.sort_values("contig").reset_index(drop=True)
    frames["fasta_valid_seqs.parquet"] = seqs
    return frames


def main() -> None:
    from disq_original_spark.session import get_spark

    spark = get_spark(app_name="oracle-fixtures", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name, pdf in build_frames(spark).items():
        _write(name, pdf)
    spark.stop()


if __name__ == "__main__":
    main()

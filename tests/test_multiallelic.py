"""Multi-allelic split (bcftools norm -m- semantics): the operator is
replayed record-by-record in pure Python and every field — alts, re-sliced
INFO, recoded GT, re-sliced FORMAT attrs — must match exactly.  Covers the
reference's own test.vcf plus a generated file with >9 alts (multi-digit GT
indexes), Number=A/R/G fields, missing values, and phased/unphased mixes."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from disq_original_spark.operators.variants import parse_declarations, split_multiallelics
from disq_original_spark.queries import QUERIES
from disq_original_spark.sources.headers import read_vcf_header_text
from disq_original_spark.sources.vcf import VcfSource

_FIXTURES = "/root/reference/src/test/resources"


# ---------------------------------------------------------- python replay
def _py_recode_gt(gt: str | None, allele: int) -> str | None:
    if gt is None:
        return None
    marked = re.sub(rf"\b{allele}\b", "\x01", gt)
    zeroed = re.sub(r"\b[1-9][0-9]*\b", "0", marked)
    return zeroed.replace("\x01", "1")


def _py_slice(value: str | None, number: str, allele: int) -> str | None:
    if value is None:
        return None
    parts = value.split(",")
    if number == "A":
        return parts[allele - 1] if allele - 1 < len(parts) else None
    if number == "R":
        # mirrors the engine: concat_ws skips the NULL from try_element_at,
        # so an out-of-range alt element leaves just the ref element
        return f"{parts[0]},{parts[allele]}" if allele < len(parts) else parts[0]
    if number == "G":
        return "."
    return value


def _py_split(rows: list[dict], info_decl, fmt_decl) -> list[dict]:
    out = []
    for r in rows:
        alts = r["alts"] or []
        if len(alts) <= 1:
            out.append({**r, "allele_idx": 1, "n_orig_alts": len(alts)})
            continue
        for i in range(1, len(alts) + 1):
            info = {
                k: _py_slice(v, info_decl.get(k, ("1", "String"))[0], i)
                for k, v in (r["info"] or {}).items()
            }
            gts = [
                {
                    "sample": g["sample"],
                    "gt": _py_recode_gt(g["gt"], i),
                    "attrs": {
                        k: (
                            _py_recode_gt(v, i)
                            if k == "GT"
                            else _py_slice(v, fmt_decl.get(k, ("1", "String"))[0], i)
                        )
                        for k, v in (g["attrs"] or {}).items()
                    },
                }
                for g in r["genotypes"]
            ]
            out.append(
                {
                    **r,
                    "alts": [alts[i - 1]],
                    "info": info,
                    "genotypes": gts,
                    "allele_idx": i,
                    "n_orig_alts": len(alts),
                }
            )
    return out


def _normalize(rows) -> list[tuple]:
    def geno(g):
        return (g["sample"], g["gt"], tuple(sorted((g["attrs"] or {}).items())))

    return sorted(
        (
            r["contig"],
            r["pos"],
            tuple(r["alts"] or []),
            r["allele_idx"],
            r["n_orig_alts"],
            tuple(sorted((r["info"] or {}).items())),
            tuple(geno(g) for g in r["genotypes"]),
        )
        for r in rows
    )


def _assert_split_matches(spark, path: str):
    hdr = read_vcf_header_text(path)
    v = VcfSource().read(spark, path)
    got = [r.asDict(recursive=True) for r in split_multiallelics(v, hdr).collect()]
    base = [r.asDict(recursive=True) for r in v.collect()]
    want = _py_split(
        base, parse_declarations(hdr, "INFO"), parse_declarations(hdr, "FORMAT")
    )
    assert _normalize(got) == _normalize(want)


def test_split_testvcf_matches_python_replay(spark):
    _assert_split_matches(spark, f"{_FIXTURES}/test.vcf")


_GEN_HEADER = """\
##fileformat=VCFv4.2
##INFO=<ID=AF,Number=A,Type=Float,Description="af">
##INFO=<ID=AD,Number=R,Type=Integer,Description="ad">
##INFO=<ID=PL,Number=G,Type=Integer,Description="pl">
##INFO=<ID=DP,Number=1,Type=Integer,Description="dp">
##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
##FORMAT=<ID=AO,Number=A,Type=Integer,Description="ao">
##FORMAT=<ID=RO,Number=R,Type=Integer,Description="ro">
##FORMAT=<ID=GL,Number=G,Type=Float,Description="gl">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="dp">
##contig=<ID=chr1,length=1000000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2
"""


def _gen_line(pos: int, alts: list[str], gts: list[str]) -> str:
    n = len(alts)
    af = ",".join(f"0.{i + 1:02d}" for i in range(n))
    ad = ",".join(str(10 + i) for i in range(n + 1))
    pl = ",".join(str(i) for i in range((n + 1) * (n + 2) // 2))
    info = f"AF={af};AD={ad};PL={pl};DP=99"
    samples = []
    for gt in gts:
        ao = ",".join(str(20 + i) for i in range(n))
        ro = ",".join(str(30 + i) for i in range(n + 1))
        gl = ",".join(f"-{i}.5" for i in range((n + 1) * (n + 2) // 2))
        samples.append(f"{gt}:{ao}:{ro}:{gl}:7")
    return (
        f"chr1\t{pos}\t.\tA\t{','.join(alts)}\t60\tPASS\t{info}\tGT:AO:RO:GL:DP\t"
        + "\t".join(samples)
    )


def test_split_generated_multidigit_and_number_slicing(spark, tmp_path):
    # 12 alts → GT indexes 10/11/12 exercise multi-digit word-boundary
    # recoding; a bi-allelic line pins the verbatim pass-through (incl. its
    # Number=G values); missing './.' and half-calls stay missing.
    alts12 = [f"A{'C' * (i + 1)}" for i in range(12)]
    lines = [
        _gen_line(100, alts12, ["11|12", "0/10"]),
        _gen_line(200, ["C", "G"], ["1/2", "./1"]),
        _gen_line(300, ["T"], ["0|1", "./."]),
        # malformed lenient input: 3 ALTs but Number=A AF has one element
        # and Number=R AD is truncated — must degrade to NULL / ref-only,
        # never abort (the try_element_at contract)
        "chr1\t400\t.\tA\tC,G,T\t60\tPASS\tAF=0.5;AD=10,11;DP=9\tGT\t1/2\t0/3",
    ]
    path = str(tmp_path / "multi.vcf")
    with open(path, "w") as f:
        f.write(_GEN_HEADER)
        f.write("\n".join(lines) + "\n")
    _assert_split_matches(spark, path)

    # spot-check the hard recode: keeping allele 11 of the 12-alt record
    hdr = read_vcf_header_text(path)
    s = split_multiallelics(VcfSource().read(spark, path), hdr)
    row = s.filter((F.col("pos") == 100) & (F.col("allele_idx") == 11)).collect()[0]
    assert [g["gt"] for g in row["genotypes"]] == ["1|0", "0/0"]
    assert row["info"]["AF"] == "0.11"
    assert row["info"]["AD"] == "10,21"  # ref, 11th alt (10+11)
    assert row["info"]["PL"] == "."
    assert row["info"]["DP"] == "99"  # scalars untouched


def test_g14_recomputed_ac_an(spark):
    """g14's AC/AN (recomputed from recoded genotypes) replayed in Python."""
    path = f"{_FIXTURES}/test.vcf"
    hdr = read_vcf_header_text(path)
    v = VcfSource().read(spark, path)
    base = [r.asDict(recursive=True) for r in v.collect()]
    want = {}
    for r in _py_split(
        base, parse_declarations(hdr, "INFO"), parse_declarations(hdr, "FORMAT")
    ):
        alleles = [
            a for g in r["genotypes"] if g["gt"] is not None for a in re.split(r"[/|]", g["gt"])
        ]
        want[(r["contig"], r["pos"], r["allele_idx"])] = (
            sum(a == "1" for a in alleles),
            sum(a != "." for a in alleles),
        )
    got = QUERIES["g14_multiallelic_split"].build(spark, "unused").collect()
    assert len(got) == len(want)
    for r in got:
        assert (r["ac"], r["an"]) == want[(r["contig"], r["pos"], r["allele_idx"])], r

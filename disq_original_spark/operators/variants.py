"""Typed promotion for VCF INFO/FORMAT fields.

The reference hands back htsjdk ``VariantContext`` objects whose INFO and
per-sample FORMAT values are typed according to the header's ``##INFO`` /
``##FORMAT`` declarations (SURVEY §1.2).  Our variants DataFrame keeps the
spec-exact string maps at scan time (schema-stable, zero parse cost for
untouched fields) and promotes to typed columns HERE, declaratively:

- Type Integer→long, Float→double, String/Character→string — native casts,
  codegen'd; an invalid or '.' value becomes NULL exactly as htsjdk's
  lenient parsing does.
- Number=0 (Flag) → boolean presence.
- Number=1 → scalar; any other Number (A, R, G, '.', k>1) → array of the
  element type via split(',').

Header declarations are parsed driver-side from the raw header text — the
same single source of truth the reference uses.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECL_RE = re.compile(
    r"##(INFO|FORMAT)=<ID=([^,>]+),Number=([^,>]+),Type=([^,>]+)"
)

_CAST = {"Integer": "long", "Float": "double", "String": "string", "Character": "string"}


def parse_declarations(header_text: str, kind: str) -> dict[str, tuple[str, str]]:
    """``{id: (number, type)}`` for ``##INFO`` (kind='INFO') or ``##FORMAT``."""
    out: dict[str, tuple[str, str]] = {}
    for m in _DECL_RE.finditer(header_text):
        if m.group(1) == kind:
            out[m.group(2)] = (m.group(3), m.group(4))
    return out


def _typed(value: Column, number: str, vtype: str) -> Column:
    # try_cast, not cast: '.' (VCF missing) and malformed values become NULL
    # (htsjdk lenient semantics) instead of an ANSI cast error.
    sql_type = _CAST.get(vtype, "string")
    if number == "1":
        return value.try_cast(sql_type)
    return F.transform(F.split(value, ","), lambda x: x.try_cast(sql_type))


def promote_info(df: DataFrame, header_text: str, prefix: str = "info_") -> DataFrame:
    """Add one typed ``info_<ID>`` column per header-declared INFO field."""
    cols = list(df.columns)
    added = []
    for key, (number, vtype) in parse_declarations(header_text, "INFO").items():
        name = f"{prefix}{key}"
        if vtype == "Flag" or number == "0":
            added.append(F.map_contains_key(F.col("info"), key).alias(name))
        else:
            added.append(_typed(F.col("info")[key], number, vtype).alias(name))
    return df.select(*cols, *added)


def explode_genotypes(df: DataFrame, header_text: str) -> DataFrame:
    """One row per (variant, sample) with typed ``fmt_<ID>`` columns from the
    header's FORMAT declarations — the relational form of htsjdk's
    per-sample ``Genotype`` objects."""
    g = df.select(
        "contig", "pos", "ref", "alts", F.explode("genotypes").alias("g")
    ).select(
        "contig",
        "pos",
        "ref",
        "alts",
        F.col("g.sample").alias("sample"),
        F.col("g.gt").alias("gt"),
        F.col("g.attrs").alias("_attrs"),
    )
    added = []
    for key, (number, vtype) in parse_declarations(header_text, "FORMAT").items():
        if key == "GT":
            continue  # already first-class
        added.append(_typed(F.col("_attrs")[key], number, vtype).alias(f"fmt_{key}"))
    return g.select(
        "contig", "pos", "ref", "alts", "sample", "gt", *added
    )


# ------------------------------------------------------ multi-allelic split
def _recode_gt(gt: Column, allele: Column) -> Column:
    """Recode a GT string for the split record keeping 1-based alt index
    ``allele``: that index becomes 1, every other non-zero allele becomes 0
    (treated as REF — the ``bcftools norm -m-`` convention), 0 and '.' are
    unchanged, and phasing separators are preserved.  Multi-digit allele
    indexes are handled via word boundaries, never digit-wise."""
    marked = F.regexp_replace(gt, F.concat(F.lit(r"\b"), allele.cast("string"), F.lit(r"\b")), F.lit("\x01"))
    zeroed = F.regexp_replace(marked, r"\b[1-9][0-9]*\b", "0")
    return F.regexp_replace(zeroed, "\x01", "1")


def _slice_by_number(value: Column, number: str, idx: Column) -> Column:
    """Re-slice a raw comma-joined VCF value for 1-based alt index ``idx``:
    Number=A keeps element idx, Number=R keeps (ref, alt idx), Number=G is
    genotype-shaped and set to missing ('.'), everything else unchanged.

    try_element_at, not element_at: a malformed record whose A/R value has
    fewer elements than the ALT count (common in real VCFs — the sources
    default to lenient stringency for the same reason) degrades to NULL /
    the ref element alone instead of aborting the job under ANSI mode."""
    parts = F.split(value, ",")
    if number == "A":
        return F.try_element_at(parts, idx)
    if number == "R":
        # concat_ws skips NULL, so a missing alt element leaves just ref
        return F.concat_ws(
            ",", F.try_element_at(parts, F.lit(1)), F.try_element_at(parts, idx + 1)
        )
    if number == "G":
        return F.lit(".")
    return value


def split_multiallelics(df: DataFrame, header_text: str) -> DataFrame:
    """Split multi-allelic variant records into bi-allelic records — the
    distributed form of ``bcftools norm -m-`` (site-level semantics; GT
    recoding maps the kept alt to 1 and all other alts to REF).

    Per input record with k ALT alleles, emits k records with:

    - ``alts`` = the single kept alt; ``allele_idx`` (1-based position in
      the original ALT list) and ``n_orig_alts`` for provenance;
    - INFO values re-sliced by their header-declared Number: A → the kept
      alt's element, R → (ref, kept alt) pair, G → missing (genotype-shaped
      likelihoods are not re-derivable without ploidy math — bcftools
      drops/recomputes these too), scalars untouched;
    - every genotype's GT (both the column and the raw FORMAT attr map)
      recoded with phasing preserved; per-sample FORMAT values re-sliced by
      the same Number rules.

    Records with 0 or 1 ALT pass through completely untouched (allele_idx=1)
    — like bcftools, already-bi-allelic records keep their Number=G values
    and genotypes verbatim.

    Scale shape: a pure map-side ``posexplode`` — no shuffle, no Python in
    the row path; every re-slice/recode is a codegen'd expression built
    driver-side from the header declarations (the same single source of
    truth htsjdk uses).  Downstream sorts/joins see ~k× rows exactly as
    they would from bcftools output.

    Reference: the engine surfaces htsjdk ``VariantContext`` semantics
    (``HtsjdkVariantsRdd.java``); allele splitting itself is downstream
    tooling there, first-class here.
    """
    info_decl = parse_declarations(header_text, "INFO")
    fmt_decl = parse_declarations(header_text, "FORMAT")
    idx = F.col("allele_idx")

    exploded = df.select(
        "*",
        F.posexplode(
            F.when(F.size("alts") > 1, F.col("alts")).otherwise(
                F.slice(F.coalesce(F.col("alts"), F.array()), 1, 1)
            )
        ).alias("_pos0", "_alt"),
    ).withColumn("allele_idx", (F.col("_pos0") + 1).cast("int"))
    # 0-alt records vanish in posexplode(empty); re-union them unchanged
    no_alt = (
        df.filter(F.size(F.coalesce(F.col("alts"), F.array())) == 0)
        .withColumn("_pos0", F.lit(0))
        .withColumn("_alt", F.lit(None).cast("string"))
        .withColumn("allele_idx", F.lit(1))
    )
    exploded = exploded.unionByName(no_alt)

    new_genotypes = F.transform(
        F.col("genotypes"),
        lambda g: F.struct(
            g["sample"].alias("sample"),
            _recode_gt(g["gt"], idx).alias("gt"),
            resliced_attrs(g["attrs"], fmt_decl, idx).alias("attrs"),
        ),
    )
    was_multi = F.col("n_orig_alts") > 1
    return (
        exploded.withColumn("n_orig_alts", F.size(F.coalesce(F.col("alts"), F.array())))
        .withColumn(
            "alts",
            F.when(F.col("_alt").isNotNull(), F.array("_alt")).otherwise(F.col("alts")),
        )
        # bi-allelic pass-through records keep info/genotypes VERBATIM —
        # in particular their Number=G values, which the split would blank
        .withColumn(
            "info",
            F.when(was_multi, resliced_attrs(F.col("info"), info_decl, idx, recode_gt=False)).otherwise(
                F.col("info")
            ),
        )
        .withColumn(
            "genotypes", F.when(was_multi, new_genotypes).otherwise(F.col("genotypes"))
        )
        .drop("_pos0", "_alt")
    )


def resliced_attrs(
    m: Column, decl: dict[str, tuple[str, str]], idx: Column, recode_gt: bool = True
) -> Column:
    """Re-slice a raw string map (INFO or per-sample FORMAT attrs) for the
    kept allele: Number=A/R/G values follow :func:`_slice_by_number`; with
    ``recode_gt`` the GT entry is recoded in place.  Only keys whose Number
    actually changes the value enter the CASE chain — scalars cost nothing."""

    def entry(e: Column) -> Column:
        v = e["value"]
        out = v
        for key, (number, _t) in decl.items():
            if number in ("A", "R", "G"):
                out = F.when(e["key"] == key, _slice_by_number(v, number, idx)).otherwise(out)
        if recode_gt:
            out = F.when(e["key"] == "GT", _recode_gt(v, idx)).otherwise(out)
        return F.struct(e["key"].alias("key"), out.alias("value"))

    return F.map_from_entries(F.transform(F.map_entries(m), entry))

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

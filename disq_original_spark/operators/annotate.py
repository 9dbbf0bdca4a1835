"""Variant→gene-model annotation (VEP/SnpEff-lite): classify each variant
locus as exonic / intronic / intergenic against a GFF3 gene model, with
nearest-gene + distance for the intergenic class — the annotation step
every variant-interpretation pipeline runs between calling and reporting.

Scale design (the whole point of the operator shape):

- The gene model is a DIMENSION — a whole-genome GFF3 rolls up to a few
  hundred thousand slim (contig, start, end, ids) rows, megabytes — so
  every decision is precomputed ON the dimension and the variant stream
  pays exactly ONE broadcast LEFT hash join plus a projection: no
  groupBy, no re-join, zero variant-scale exchange — a 100 TB VCF lake
  annotates embarrassingly parallel.
- The dimension flattens to DISJOINT elementary segments: every gene/
  exon/gap start and end+1 is a breakpoint, and each inter-breakpoint
  segment precomputes its winning exon gene, gene-span gene, and gap
  flank payload (containment joins + min aggregates, all O(features)
  dimension-side; they run as tiny broadcast non-equi joins here and
  would bin the same way as the fact join at full-genome dimension
  size).  Disjoint + tiling means a variant matches EXACTLY one segment.
- "Nearest gene" is turned from a search problem into an interval lookup:
  gene spans merge into islands (gaps-and-islands window over the tiny
  dimension, same shape as ``interval.merge_intervals``), and the GAPS
  between consecutive islands carry their flanking genes (left = island's
  max-end gene, right = next island's min-start gene).  A variant in a
  gap segment reads both candidate distances off the one matched row —
  no sort-merge, no per-variant search.
- Non-equi overlap predicates on the FACT join would force
  BroadcastNestedLoopJoin (O(rows × intervals) per task); binning the
  segments into fixed-width buckets converts the lookup into an EQUI
  join on (contig, bin) + a residual range condition — the repo's
  established interval-algebra shape (``queries/genomic.py`` g05/g08).
  Gaps are bounded by the GFF3 ``##sequence-region`` directive, so even
  multi-megabase deserts explode into a handful of dimension-side bins.

Tie-break contract (mirrored exactly by the g26 DuckDB oracle): any exon
hit wins over gene-span hits; multiple hits of the winning kind resolve to
the lexicographically smallest gene id; intergenic nearest picks the
smaller distance, equidistant resolves to the smaller gene id.  Variants
on contigs with no gene model (or past the declared bound) classify
intergenic with NULL gene/distance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BIN = 16384


def gene_features(gff: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a GFF3 frame (``sources/gff.py`` schema) into the two slim
    dimension tables annotation needs: genes (contig, gstart, gend,
    gene_id) and exons (contig, fstart, fend, gene_id) with the exon's
    gene resolved through the mRNA Parent hop (gene → mRNA → exon), the
    same ID/Parent hierarchy g25 rolls up.

    GFF3 ``Parent`` is multi-valued (``Parent=t1,t2`` — an exon shared by
    several isoforms), so both hops split on ',' and explode before the
    join; a first-letter-naive equi-join would silently drop such exons
    from every rollup (ADVICE r5).  The split is exact, not heuristic: the
    source deliberately leaves ``%2C`` undecoded (``sources/gff.py``), so a
    comma in the decoded attribute value is ALWAYS the multi-value
    separator, never literal content."""
    feats = gff.select(
        F.col("seqid").alias("contig"), "type", "start", "end",
        F.col("attributes")["ID"].alias("id"),
        F.col("attributes")["Parent"].alias("parent"),
    )
    genes = feats.filter(F.col("type") == "gene").select(
        "contig",
        F.col("start").alias("gstart"),
        F.col("end").alias("gend"),
        F.col("id").alias("gene_id"),
    )
    tx = feats.filter(F.col("type") == "mRNA").select(
        F.col("id").alias("tx_id"),
        F.explode(F.split("parent", ",")).alias("gene_id"),
    )
    exons = (
        feats.filter(F.col("type") == "exon")
        .select(
            "contig", "start", "end",
            F.explode(F.split("parent", ",")).alias("tx_id"),
        )
        .join(tx, "tx_id")
        .select(
            "contig",
            F.col("start").alias("fstart"),
            F.col("end").alias("fend"),
            "gene_id",
        )
    )
    return genes, exons


def _gap_intervals(genes: DataFrame, bounds: DataFrame) -> DataFrame:
    """Intergenic gap intervals carrying their flanking genes.

    Gene spans merge into islands per contig (window: a gene opens a new
    island iff its start exceeds the running max end so far — island
    coverage is therefore contiguous, every position inside an island
    overlaps ≥1 gene).  Each island knows its edge genes via the
    struct-min trick: min(struct(-gend, gene_id)) = the max-end gene with
    ties to the smaller id (the LEFT flank of the gap after the island),
    min(struct(gstart, gene_id)) = the min-start gene (the RIGHT flank of
    the gap before it).  lag() over islands then emits one gap row per
    consecutive pair, plus the leading gap from position 1 and the
    trailing gap up to the contig's declared ``##sequence-region`` end
    (contigs missing from ``bounds`` get no trailing gap — variants past
    the last gene there surface as NULL-annotated, loud in any oracle
    comparison, rather than silently mis-measured).

    Everything here is dimension-side: one exchange + windows over the
    slim gene table; cost is O(genes), independent of variant volume.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("contig").orderBy("gstart", "gend", "gene_id")
    prev_max = F.max("gend").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opens = (prev_max.isNull() | (F.col("gstart") > prev_max)).cast("long")
    island = F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0))
    islands = (
        genes.withColumn("_island", island)
        .groupBy("contig", "_island")
        .agg(
            F.min("gstart").alias("mstart"),
            F.max("gend").alias("mend"),
            F.min(
                F.struct((-F.col("gend")).alias("k"), F.col("gene_id").alias("id"))
            )["id"].alias("max_end_gene"),
            F.min(
                F.struct(F.col("gstart").alias("k"), F.col("gene_id").alias("id"))
            )["id"].alias("min_start_gene"),
        )
    )
    wi = Window.partitionBy("contig").orderBy("mstart")
    before = islands.select(
        "contig",
        (F.coalesce(F.lag("mend").over(wi), F.lit(0)) + 1).alias("start"),
        (F.col("mstart") - 1).alias("end"),
        F.lag("max_end_gene").over(wi).alias("left_id"),
        F.lag("mend").over(wi).alias("left_end"),
        F.col("min_start_gene").alias("right_id"),
        F.col("mstart").alias("right_start"),
    )
    last = islands.groupBy("contig").agg(
        F.max(
            F.struct(
                F.col("mstart").alias("k"),
                F.col("mend").alias("mend"),
                F.col("max_end_gene").alias("id"),
            )
        ).alias("t")
    )
    trailing = last.join(bounds, "contig").select(
        "contig",
        (F.col("t")["mend"] + 1).alias("start"),
        F.col("contig_end").alias("end"),
        F.col("t")["id"].alias("left_id"),
        F.col("t")["mend"].alias("left_end"),
        F.lit(None).cast("string").alias("right_id"),
        F.lit(None).cast("long").alias("right_start"),
    )
    return before.unionByName(trailing).filter(F.col("start") <= F.col("end"))


def annotate_variants(
    variants: DataFrame,
    genes: DataFrame,
    exons: DataFrame,
    bounds: DataFrame,
    bin_size: int = _DEFAULT_BIN,
) -> DataFrame:
    """Classify each distinct variant locus against the gene model.

    variants: (contig, pos) — duplicates collapse to one output locus.
    genes: (contig, gstart, gend, gene_id); exons: (contig, fstart, fend,
    gene_id); bounds: (contig, contig_end) from ``##sequence-region``.

    Returns (contig, pos, vclass, gene_id, dist): vclass ∈ exonic /
    intronic / intergenic; dist = 0 inside a gene, distance to the
    nearest gene span otherwise (NULL when the contig has no bounded
    model to measure against).

    The dimension is flattened into DISJOINT elementary segments before
    the fact join: every gene/exon/gap start and end+1 is a breakpoint,
    each inter-breakpoint segment precomputes its winning exon gene,
    gene-span gene, and gap flank payload (containment joins + min
    aggregates — all dimension-side, O(features)).  A variant locus
    therefore matches EXACTLY ONE segment, so the entire variant-side
    plan is one broadcast LEFT hash join + a projection: no groupBy, no
    re-join, zero variant-scale exchange of any kind.
    """
    b = F.lit(bin_size)
    gaps = _gap_intervals(genes, bounds)
    bp = (
        genes.select("contig", F.col("gstart").alias("p"))
        .unionByName(genes.select("contig", (F.col("gend") + 1).alias("p")))
        .unionByName(exons.select("contig", F.col("fstart").alias("p")))
        .unionByName(exons.select("contig", (F.col("fend") + 1).alias("p")))
        .unionByName(gaps.select("contig", F.col("start").alias("p")))
        .unionByName(gaps.select("contig", (F.col("end") + 1).alias("p")))
        .distinct()
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("contig").orderBy("p")
    seg = bp.select(
        "contig",
        F.col("p").alias("start"),
        (F.lead("p").over(wp) - 1).alias("end"),
    ).filter(F.col("end").isNotNull())
    # segments never straddle a source-interval boundary (every boundary
    # IS a breakpoint), so overlap == containment in the tag joins below
    def _tag(src: DataFrame, s: str, e: str, agg: Column, name: str) -> DataFrame:
        j = seg.alias("sg").join(
            F.broadcast(src.alias("iv")),
            (F.col("sg.contig") == F.col("iv.contig"))
            & (F.col("sg.start") >= F.col(f"iv.{s}"))
            & (F.col("sg.end") <= F.col(f"iv.{e}")),
        )
        return j.groupBy(
            F.col("sg.contig").alias("contig"),
            F.col("sg.start").alias("start"),
        ).agg(agg.alias(name))

    ex_tag = _tag(exons, "fstart", "fend", F.min("iv.gene_id"), "ex_gid")
    g_tag = _tag(genes, "gstart", "gend", F.min("iv.gene_id"), "g_gid")
    gap_tag = (
        seg.alias("sg")
        .join(
            F.broadcast(gaps.alias("iv")),
            (F.col("sg.contig") == F.col("iv.contig"))
            & (F.col("sg.start") >= F.col("iv.start"))
            & (F.col("sg.end") <= F.col("iv.end")),
        )
        .select(
            F.col("sg.contig").alias("contig"),
            F.col("sg.start").alias("start"),
            "iv.left_id", "iv.left_end", "iv.right_id", "iv.right_start",
        )
    )
    # dimension-side assembly joins are broadcast too: every frame here is
    # O(features), and keeping the whole plan SortMergeJoin-free makes the
    # "no variant-scale exchange" contract assertable from the plan text
    dim = (
        seg.join(F.broadcast(ex_tag), ["contig", "start"], "left")
        .join(F.broadcast(g_tag), ["contig", "start"], "left")
        .join(F.broadcast(gap_tag), ["contig", "start"], "left")
        .select(
            "contig", "start", "end", "ex_gid", "g_gid",
            "left_id", "left_end", "right_id", "right_start",
        )
    )
    dimb = dim.withColumn(
        "bin",
        F.explode(F.sequence(F.floor(F.col("start") / b), F.floor(F.col("end") / b))),
    )
    loci = (
        variants.select("contig", "pos")
        .distinct()
        .withColumn("bin", F.floor(F.col("pos") / b))
        .alias("v")
    )
    d = dimb.alias("d")
    res = loci.join(
        F.broadcast(d),
        (F.col("v.contig") == F.col("d.contig"))
        & (F.col("v.bin") == F.col("d.bin"))
        & (F.col("v.pos") >= F.col("d.start"))
        & (F.col("v.pos") <= F.col("d.end")),
        "left",
    )
    pos = F.col("v.pos")
    ldist = pos - F.col("left_end")
    rdist = F.col("right_start") - pos
    pick_left = F.col("left_id").isNotNull() & (
        F.col("right_id").isNull()
        | (ldist < rdist)
        | ((ldist == rdist) & (F.col("left_id") < F.col("right_id")))
    )
    near_id = F.when(pick_left, F.col("left_id")).otherwise(F.col("right_id"))
    near_dist = F.when(pick_left, ldist).otherwise(rdist)
    vclass = (
        F.when(F.col("ex_gid").isNotNull(), F.lit("exonic"))
        .when(F.col("g_gid").isNotNull(), F.lit("intronic"))
        .otherwise(F.lit("intergenic"))
    )
    return res.select(
        F.col("v.contig").alias("contig"),
        pos.alias("pos"),
        vclass.alias("vclass"),
        F.coalesce(F.col("ex_gid"), F.col("g_gid"), near_id).alias("gene_id"),
        F.when(
            F.col("ex_gid").isNotNull() | F.col("g_gid").isNotNull(),
            F.lit(0).cast("long"),
        ).otherwise(near_dist.cast("long")).alias("dist"),
    )

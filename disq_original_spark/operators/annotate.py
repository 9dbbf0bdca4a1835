"""Variant→gene-model annotation (VEP/SnpEff-lite): classify each variant
locus as exonic / intronic / intergenic against a GFF3 gene model, with
nearest-gene + distance for the intergenic class — the annotation step
every variant-interpretation pipeline runs between calling and reporting.

Scale design (the whole point of the operator shape):

- The gene model is a DIMENSION — a whole-genome GFF3 rolls up to a few
  hundred thousand slim (contig, start, end, ids) rows, megabytes — so
  every heavy decision is precomputed ON the dimension and the variant
  stream pays ONE broadcast hash join, map-side, no variant shuffle:
  a 100 TB VCF lake annotates embarrassingly parallel.
- "Nearest gene" is turned from a search problem into an interval lookup:
  gene spans merge into islands (gaps-and-islands window over the tiny
  dimension, same shape as ``interval.merge_intervals``), and the GAPS
  between consecutive islands become intervals that carry their flanking
  genes (left = island's max-end gene, right = next island's min-start
  gene).  A variant in a gap reads both candidate distances off the one
  matched row — no sort-merge, no per-variant search.
- Non-equi overlap predicates would force BroadcastNestedLoopJoin (O(rows
  × intervals) per task); binning the dimension intervals into fixed-width
  buckets converts the lookup into an EQUI join on (contig, bin) + a
  residual range filter — the repo's established interval-algebra shape
  (``queries/genomic.py`` g05/g08).  Gaps are bounded by the GFF3
  ``##sequence-region`` directive, so even multi-megabase deserts explode
  into a handful of dimension-side bins.

Tie-break contract (mirrored exactly by the g26 DuckDB oracle): any exon
hit wins over gene-span hits; multiple hits of the winning kind resolve to
the lexicographically smallest gene id; intergenic nearest picks the
smaller distance, equidistant resolves to the smaller gene id.  Variants
on contigs with no gene model (or past the declared bound) classify
intergenic with NULL gene/distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_BIN = 16384


def gene_features(gff: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a GFF3 frame (``sources/gff.py`` schema) into the two slim
    dimension tables annotation needs: genes (contig, gstart, gend,
    gene_id) and exons (contig, fstart, fend, gene_id) with the exon's
    gene resolved through the mRNA Parent hop (gene → mRNA → exon), the
    same ID/Parent hierarchy g25 rolls up."""
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
        F.col("id").alias("tx_id"), F.col("parent").alias("gene_id")
    )
    exons = (
        feats.filter(F.col("type") == "exon")
        .select("contig", "start", "end", F.col("parent").alias("tx_id"))
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
    """
    b = F.lit(bin_size)
    dim = (
        exons.select(
            "contig",
            F.col("fstart").alias("start"),
            F.col("fend").alias("end"),
            F.lit("exon").alias("kind"),
            "gene_id",
            F.lit(None).cast("string").alias("left_id"),
            F.lit(None).cast("long").alias("left_end"),
            F.lit(None).cast("string").alias("right_id"),
            F.lit(None).cast("long").alias("right_start"),
        )
        .unionByName(
            genes.select(
                "contig",
                F.col("gstart").alias("start"),
                F.col("gend").alias("end"),
                F.lit("gene").alias("kind"),
                "gene_id",
                F.lit(None).cast("string").alias("left_id"),
                F.lit(None).cast("long").alias("left_end"),
                F.lit(None).cast("string").alias("right_id"),
                F.lit(None).cast("long").alias("right_start"),
            )
        )
        .unionByName(
            _gap_intervals(genes, bounds).select(
                "contig", "start", "end",
                F.lit("gap").alias("kind"),
                F.lit(None).cast("string").alias("gene_id"),
                "left_id", "left_end", "right_id", "right_start",
            )
        )
    )
    dimb = dim.withColumn(
        "bin",
        F.explode(F.sequence(F.floor(F.col("start") / b), F.floor(F.col("end") / b))),
    )
    loci = variants.select("contig", "pos").distinct()
    hits = (
        loci.withColumn("bin", F.floor(F.col("pos") / b))
        .join(F.broadcast(dimb), ["contig", "bin"])
        .filter((F.col("pos") >= F.col("start")) & (F.col("pos") <= F.col("end")))
    )
    kind = F.col("kind")
    agg = hits.groupBy("contig", "pos").agg(
        F.min(F.when(kind == "exon", F.col("gene_id"))).alias("ex_gid"),
        F.min(F.when(kind == "gene", F.col("gene_id"))).alias("g_gid"),
        # at most one gap interval can contain a position (gaps are
        # disjoint by construction), so max() just extracts the value
        F.max(F.when(kind == "gap", F.col("left_id"))).alias("left_id"),
        F.max(F.when(kind == "gap", F.col("left_end"))).alias("left_end"),
        F.max(F.when(kind == "gap", F.col("right_id"))).alias("right_id"),
        F.max(F.when(kind == "gap", F.col("right_start"))).alias("right_start"),
    )
    res = loci.join(agg, ["contig", "pos"], "left")
    ldist = F.col("pos") - F.col("left_end")
    rdist = F.col("right_start") - F.col("pos")
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
        "contig",
        "pos",
        vclass.alias("vclass"),
        F.coalesce(F.col("ex_gid"), F.col("g_gid"), near_id).alias("gene_id"),
        F.when(
            F.col("ex_gid").isNotNull() | F.col("g_gid").isNotNull(), F.lit(0).cast("long")
        ).otherwise(near_dist.cast("long")).alias("dist"),
    )

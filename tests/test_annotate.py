"""g26 variant annotation: classification semantics on synthetic gene
models (every class, both nearest sides, all tie-breaks, the degenerate
contigs), the broadcast binned-join plan contract, and freshness of the
generated HiSeq-range annotation fixture.  Whole-fixture oracle parity
runs in tests/test_oracle.py like every registered query."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from disq_original_spark.operators.annotate import annotate_variants, gene_features
from disq_original_spark.queries import QUERIES

FIXTURE = str(
    Path(__file__).resolve().parent.parent / "fixtures" / "annotation_hiseq.gff3"
)


def _frames(spark, genes, exons, bounds):
    g = spark.createDataFrame(
        genes, "contig string, gstart long, gend long, gene_id string"
    )
    e = spark.createDataFrame(
        exons, "contig string, fstart long, fend long, gene_id string"
    )
    b = spark.createDataFrame(bounds, "contig string, contig_end long")
    return g, e, b


def _annotate(spark, variants, genes, exons, bounds, bin_size=64):
    v = spark.createDataFrame(variants, "contig string, pos long")
    g, e, b = _frames(spark, genes, exons, bounds)
    out = annotate_variants(v, g, e, b, bin_size=bin_size)
    return {(r["contig"], r["pos"]): (r["vclass"], r["gene_id"], r["dist"])
            for r in out.collect()}


def test_classes_and_nearest_sides(spark):
    # gene A [100,200] with exon [120,140]; gene B [400,500]
    genes = [("c", 100, 200, "gA"), ("c", 400, 500, "gB")]
    exons = [("c", 120, 140, "gA")]
    bounds = [("c", 1000)]
    got = _annotate(
        spark,
        [("c", 130), ("c", 150), ("c", 250), ("c", 380), ("c", 50), ("c", 700),
         ("c", 300)],
        genes, exons, bounds,
    )
    assert got[("c", 130)] == ("exonic", "gA", 0)
    assert got[("c", 150)] == ("intronic", "gA", 0)
    assert got[("c", 250)] == ("intergenic", "gA", 50)   # left nearer
    assert got[("c", 380)] == ("intergenic", "gB", 20)   # right nearer
    assert got[("c", 50)] == ("intergenic", "gA", 50)    # leading gap: right only
    assert got[("c", 700)] == ("intergenic", "gB", 200)  # trailing gap: left only
    # equidistant (200..400 midpoint): min gene_id wins
    assert got[("c", 300)] == ("intergenic", "gA", 100)


def test_overlapping_genes_and_tiebreaks(spark):
    # overlapping genes: gZ [100,300] and gA [200,400]; exon only in gZ
    genes = [("c", 100, 300, "gZ"), ("c", 200, 400, "gA")]
    exons = [("c", 250, 260, "gZ")]
    bounds = [("c", 1000)]
    got = _annotate(
        spark, [("c", 255), ("c", 220), ("c", 350), ("c", 500)],
        genes, exons, bounds,
    )
    # exon beats intron even though gA also spans 255
    assert got[("c", 255)] == ("exonic", "gZ", 0)
    # multi-gene intron hit: lexicographically smallest id
    assert got[("c", 220)] == ("intronic", "gA", 0)
    assert got[("c", 350)] == ("intronic", "gA", 0)
    # the island's max-end gene (gA, end 400) flanks the trailing gap
    assert got[("c", 500)] == ("intergenic", "gA", 100)


def test_degenerate_contigs_and_edges(spark):
    genes = [("c", 100, 200, "gA"), ("c", 201, 300, "gB")]  # book-ended
    exons = []
    bounds = [("c", 1000)]  # note: contig "nogenes" and "nobound" unbounded
    got = _annotate(
        spark,
        [("c", 200), ("c", 201), ("nogenes", 50), ("c", 1000)],
        genes + [("nobound", 10, 20, "gN")], exons, bounds,
    )
    # boundary positions belong to the genes (closed intervals), and the
    # book-ended pair leaves no gap row between them
    assert got[("c", 200)] == ("intronic", "gA", 0)
    assert got[("c", 201)] == ("intronic", "gB", 0)
    # contig with no gene model: intergenic with nothing to measure
    assert got[("nogenes", 50)] == ("intergenic", None, None)
    # bound position itself is inside the trailing gap
    assert got[("c", 1000)] == ("intergenic", "gB", 700)


def test_no_bound_no_trailing_gap(spark):
    """A contig missing from bounds gets NO trailing gap: a variant past
    the last gene surfaces as NULL-annotated intergenic (loud in any
    oracle comparison) instead of silently mis-measured."""
    got = _annotate(
        spark, [("u", 500), ("u", 5)],
        [("u", 10, 20, "gU")], [], [("other", 99)],
    )
    assert got[("u", 500)] == ("intergenic", None, None)
    # the LEADING gap needs no bound — it still measures
    assert got[("u", 5)] == ("intergenic", "gU", 5)


def test_duplicate_loci_collapse(spark):
    got = _annotate(
        spark, [("c", 150), ("c", 150), ("c", 150)],
        [("c", 100, 200, "gA")], [], [("c", 400)],
    )
    assert len(got) == 1 and got[("c", 150)] == ("intronic", "gA", 0)


def test_gene_features_resolves_parent_hop(spark):
    from disq_original_spark.sources.gff import GffSource

    genes, exons = gene_features(GffSource().read(spark, FIXTURE))
    g = genes.count()
    assert g == 140
    # every exon resolved to a gene that exists
    assert (
        exons.join(genes.select("gene_id"), "gene_id", "left_anti").count() == 0
    )


def test_gene_features_explodes_multivalued_parent(spark, tmp_path):
    """GFF3 ``Parent=t1,t2`` (an exon shared by two isoforms, or an mRNA
    claimed by two genes) must reach EVERY named parent — the r5 equi-join
    on the raw comma-joined string silently dropped such rows (ADVICE r5).
    A literal ``%2C`` stays part of the ID (the source never decodes it),
    so the escaped-comma transcript keeps exactly its own exon."""
    from disq_original_spark.sources.gff import GffSource

    gff = tmp_path / "multi_parent.gff3"
    gff.write_text(
        "##gff-version 3\n"
        "c\t.\tgene\t100\t500\t.\t+\t.\tID=gA\n"
        "c\t.\tgene\t600\t900\t.\t+\t.\tID=gB\n"
        "c\t.\tmRNA\t100\t500\t.\t+\t.\tID=t1;Parent=gA\n"
        "c\t.\tmRNA\t100\t900\t.\t+\t.\tID=t2;Parent=gA,gB\n"
        "c\t.\tmRNA\t600\t900\t.\t+\t.\tID=t%2C3;Parent=gB\n"
        "c\t.\texon\t120\t140\t.\t+\t.\tID=e1;Parent=t1,t2\n"
        "c\t.\texon\t700\t720\t.\t+\t.\tID=e2;Parent=t%2C3\n"
    )
    genes, exons = gene_features(GffSource().read(spark, str(gff)))
    got = sorted(
        (r["gene_id"], r["fstart"], r["fend"]) for r in exons.collect()
    )
    # e1 reaches gA twice (via t1 AND via the exploded t2) and gB once
    # (t2's second parent); the %2C transcript keeps e2 for gB only.
    assert got == [
        ("gA", 120, 140), ("gA", 120, 140), ("gB", 120, 140), ("gB", 700, 720)
    ]
    # the g25/g26 oracle pattern (unnest(string_split(parent, ','))) must
    # agree with Spark's explode(split(...)) on the same corpus — including
    # NULL-parent drop semantics and the undecoded %2C
    import duckdb

    oracle = duckdb.sql(
        f"""WITH f AS (
              SELECT columns[3] AS type,
                     CAST(columns[4] AS BIGINT) AS fs, CAST(columns[5] AS BIGINT) AS fe,
                     list_filter(string_split(columns[9], ';'),
                                 a -> a LIKE 'ID=%')[-1][4:] AS id,
                     list_filter(string_split(columns[9], ';'),
                                 a -> a LIKE 'Parent=%')[-1][8:] AS parent
              FROM (SELECT string_split(line, chr(9)) AS columns FROM
                    read_csv('{gff}', delim=NULL, header=false, names=['line'])
                    WHERE line NOT LIKE '#%')),
            tx AS (SELECT id AS tx_id, unnest(string_split(parent, ',')) AS gene_id
                   FROM f WHERE type = 'mRNA'),
            ex AS (SELECT unnest(string_split(parent, ',')) AS tx_id, fs, fe
                   FROM f WHERE type = 'exon')
            SELECT tx.gene_id, ex.fs, ex.fe FROM ex JOIN tx USING (tx_id)
            ORDER BY 1, 2, 3"""
    ).fetchall()
    assert [tuple(r) for r in oracle] == got


def test_g26_plan_broadcast_binned(spark):
    """The variant stream must pay ONE broadcast hash equi-join — a
    BroadcastNestedLoopJoin or cartesian product here is the O(rows ×
    intervals) shape the binning exists to avoid."""
    df = QUERIES["g26_variant_annotation"].build(spark, "ignored")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the disjoint-segment design: every join in the plan broadcasts
    # (fact side LEFT outer, dim-side assembly), so no sort-merge join —
    # the variant stream is never exchanged
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_exactly_one_segment_per_locus(spark):
    """Row-count conservation pins the disjoint-tiling invariant: the
    single left broadcast join must emit EXACTLY one row per distinct
    locus — a segment overlap would silently duplicate variants."""
    import random

    from disq_original_spark.operators.annotate import annotate_variants

    rng = random.Random(5)
    genes, exons = [], []
    cur = 10
    for i in range(30):
        g0 = cur + rng.randrange(5, 40)
        g1 = g0 + rng.randrange(10, 120)
        genes.append(("c", g0, g1, f"g{i:02d}"))
        e0 = g0 + rng.randrange(0, max(1, (g1 - g0) // 2))
        exons.append(("c", e0, min(g1, e0 + rng.randrange(1, 30)), f"g{i:02d}"))
        cur = g1 if rng.random() < 0.3 else g1 + rng.randrange(0, 50)
    v = [("c", p) for p in range(1, 2500)]
    g, e, b = _frames(spark, genes, exons, [("c", 5000)])
    out = annotate_variants(
        spark.createDataFrame(v, "contig string, pos long"), g, e, b, bin_size=64
    )
    assert out.count() == len(v)


def _brute_annotate(variants, genes, exons, bounds):
    """Independent per-locus brute force of the full annotation contract,
    including the measurability rule (past the last gene with no bound,
    or past the bound, nearest is NULL)."""
    bmap = dict(bounds)
    out = {}
    for c, p in set(variants):
        ex_hits = sorted(g for cc, s, e, g in exons if cc == c and s <= p <= e)
        g_hits = sorted(g for cc, s, e, g in genes if cc == c and s <= p <= e)
        if ex_hits:
            out[(c, p)] = ("exonic", ex_hits[0], 0)
            continue
        if g_hits:
            out[(c, p)] = ("intronic", g_hits[0], 0)
            continue
        gs = [(s, e, g) for cc, s, e, g in genes if cc == c]
        if not gs:
            out[(c, p)] = ("intergenic", None, None)
            continue
        last_end = max(e for _s, e, _g in gs)
        bound = bmap.get(c)
        if p > last_end and (bound is None or p > bound):
            out[(c, p)] = ("intergenic", None, None)
            continue
        dist, gid = min(
            ((s - p if p < s else p - e), g) for s, e, g in gs
        )
        out[(c, p)] = ("intergenic", gid, dist)
    return out


def test_differential_fuzz_vs_bruteforce(spark):
    """Randomized gene models (overlapping, nested, book-ended), exon
    placements, bounded/unbounded/geneless contigs, and variants before/
    inside/between/past everything — the operator must match the
    independent brute force exactly, across seeds and a stressy small
    bin size."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        genes, exons = [], []
        bounds = [("cb", 3000)]  # "cu" stays unbounded; "empty" geneless
        for contig in ("cb", "cu"):
            cur = rng.randrange(5, 60)
            while cur < 2200:
                g0 = cur
                g1 = g0 + rng.randrange(5, 200)
                gid = f"{contig}_g{len(genes):03d}"
                genes.append((contig, g0, g1, gid))
                for _ in range(rng.randrange(0, 3)):
                    e0 = g0 + rng.randrange(0, max(1, g1 - g0))
                    exons.append(
                        (contig, e0, min(g1, e0 + rng.randrange(1, 40)), gid)
                    )
                # sometimes overlap/nest the next gene, sometimes gap
                cur = g1 + rng.choice([-40, -10, 1, 2, 30, 300])
                cur = max(cur, g0 + 1)
        variants = [
            (c, rng.randrange(1, 3500))
            for c in ("cb", "cu", "empty")
            for _ in range(120)
        ]
        got = _annotate(spark, variants, genes, exons, bounds, bin_size=32)
        want = _brute_annotate(variants, genes, exons, bounds)
        assert got == want, (
            seed,
            {k: (got[k], want[k]) for k in got if got[k] != want.get(k)},
        )


def test_oracle_attr_decode_matches_spark(spark):
    """The oracles' %XX replace-chain must decode exactly like the Spark
    read path — otherwise an escaped ID/Parent in a future fixture would
    break gene joins on the oracle side only (the latent asymmetry this
    helper exists to close)."""
    import duckdb

    from disq_original_spark.queries.genomic import _sql_attr_decode
    from disq_original_spark.sources.gff import _attr_decode

    cases = [
        "plain", "g%3B1", "a%3b%3Db", "%2525", "%253B", "t%09x%0Ay%0dz",
        "%26amp", "pct%25", "mix%3B%3d%26%09%0A%0D%25end", "%2C,keepcomma",
    ]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {_sql_attr_decode('?::VARCHAR')}", [c]).fetchone()[0]
        for c in cases
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r["d"] for r in df.select(_attr_decode(F.col("s")).alias("d")).collect()]
    assert got == want


def test_hiseq_fixture_fresh():
    """The committed fixture must be exactly what the generator produces —
    a drifted fixture would silently anchor g26's oracle to stale data."""
    import tools.build_annotation_fixture as gen

    assert gen.build_hiseq() == Path(FIXTURE).read_text()

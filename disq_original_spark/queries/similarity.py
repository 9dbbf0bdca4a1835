"""Similarity search over the embeddings table (s01–s09).

- s01: brute-force cosine top-k — the correctness baseline.  Query set is tiny
  (broadcast side); corpus side streams, so at 100 TB this is one broadcast
  nested-loop with two-stage top-k (``_rank_topk``: a partial
  WindowGroupLimit truncates each map partition to k rows per query before
  the q_id shuffle, so the rank stage never sees corpus-sized data).
- s02: bucketed ANN — sign-LSH on the leading dimensions gives the bucket id
  (stand-in for IVF cell assignment); candidates only within the query's
  bucket.  Recall/cost is tunable by bucket bits; the point is the *plan*: the
  cross product shrinks to an equi-join on bucket id.
- s03: IVF ANN — deterministic "trained" centroids (a fixed sample of the
  corpus, standing in for k-means output), cell assignment computed entirely
  map-side against the broadcast centroid list, queries probe their nprobe
  nearest cells, candidate search is an equi-join on cell id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..cache import share_subtree
from ..functions import cosine_similarity
from ..tables import load_table, table_bytes
from .registry import query

_K = 10
_N_QUERIES = 5  # vec_id < 5 are the query vectors
_BUCKET_BITS = 4

_BUCKET_SQL = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(_BUCKET_BITS)
)


def _bucket_col() -> F.Column:
    return F.concat(
        *[
            F.when(F.element_at("embedding", i + 1) >= 0, "1").otherwise("0")
            for i in range(_BUCKET_BITS)
        ]
    )


def _rank_topk(scored: DataFrame, k: int = _K) -> DataFrame:
    """Two-stage top-k per query: rank scored candidates by (cos_sim desc,
    neighbor_id) within each q_id and keep the first ``k``.

    The ``row_number() <= k`` filter compiles to a pair of WindowGroupLimit
    nodes (SPARK-37099): the PARTIAL one runs before the q_id Exchange and
    locally truncates every map partition to its own top-k per query, so the
    shuffle carries at most k × partitions rows per query — independent of
    how many candidates were scored.  The post-shuffle FINAL limit + rank
    then touches only that bounded set, so the few-reducer q_id partitioning
    never sees corpus-sized data even for s01's full scan.
    ``tests/test_plans.py::test_similarity_topk_partial_limit`` pins this.
    (Do NOT pin the q_id exchange's width with an explicit repartition:
    r14 measured it — the optimizer refuses to push the Partial limit
    below a user repartition, so the exchange loses its truncation.)
    """
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------- s01 brute-force top-k
@query(
    "s01_knn_bruteforce",
    f"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
                   WHERE vec_id < {_N_QUERIES}),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cos_sim
          FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
        SELECT q_id, neighbor_id, cos_sim, rank FROM ranked
        WHERE rank <= {_K} ORDER BY q_id, rank""",
    doc="Brute-force cosine k-NN, query side broadcast.",
)
def s01(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qe"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    return _rank_topk(scored)


# ---------------------------------------------------------------- s02 bucketed ANN
@query(
    "s02_ann_bucketed",
    f"""WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b
              WHERE vec_id < {_N_QUERIES}),
        scored AS (
          SELECT q.q_id, e.vec_id AS neighbor_id,
                 round(list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 4) AS cos_sim
          FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.q_id),
        ranked AS (
          SELECT q_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
        SELECT q_id, neighbor_id, cos_sim, rank FROM ranked
        WHERE rank <= {_K} ORDER BY q_id, rank""",
    doc="Sign-LSH bucketed ANN: candidates restricted to the query's bucket — "
    "the cross product becomes an equi-join on bucket id.",
)
def s02(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings").withColumn("bucket", _bucket_col())
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(e, (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qe"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    return _rank_topk(scored)


# ---------------------------------------------------------------- s03 IVF ANN
_CENTROID_STRIDE = 97  # vec_id % stride == 0 → deterministic "trained" centroids
_CENTROID_CAP = 64  # max IVF centroids ever materialized driver-side
_PQ_CODEBOOK_CAP = 256  # max PQ codewords (the classic 8-bit PQ codebook size)


def _bounded_stride(n: int, base: int, cap: int) -> int:
    """Centroid-sample stride that keeps the driver-collected "training
    artifact" at O(cap) rows at ANY corpus size (VERDICT r5: a fixed stride
    made the s03/s05 ``toPandas()`` grow as corpus/stride — 100× data meant
    a 100× driver collect).  ``max(base, ceil(n / cap))``: at the shipped
    SFs the base stride wins (results unchanged), past ``base*cap`` rows
    the stride scales with n so the sample never exceeds ``cap`` vectors.
    The oracles compute the identical
    ``greatest(base, (count(*) + cap - 1) // cap)`` — DuckDB ``//`` and
    Python ``-(-n // cap)`` agree on nonnegative ints."""
    return max(base, -(-n // cap))
_NPROBE = 2

_COS_SQL = (
    "round(list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), 4)"
)


@query(
    "s03_ann_ivf",
    f"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id % greatest({_CENTROID_STRIDE},
                     (SELECT (count(*) + {_CENTROID_CAP} - 1) // {_CENTROID_CAP}
                      FROM embeddings)) = 0),
        assign AS (
          SELECT e.vec_id, e.embedding, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                                    ORDER BY {_COS_SQL.format(a='e.embedding', b='c.ce')} DESC,
                                             c.cid) AS rn
          FROM embeddings e CROSS JOIN c),
        cells AS (SELECT vec_id, embedding, cid AS cell FROM assign WHERE rn = 1),
        probe AS (
          SELECT vec_id AS q_id, embedding AS qe, cid AS pcell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY {_COS_SQL.format(a='embedding', b='ce')} DESC,
                                             cid) AS prn
          FROM embeddings CROSS JOIN c WHERE vec_id < {_N_QUERIES}),
        scored AS (
          SELECT p.q_id, e.vec_id AS neighbor_id,
                 {_COS_SQL.format(a='p.qe', b='e.embedding')} AS cos_sim
          FROM probe p JOIN cells e ON e.cell = p.pcell AND e.vec_id <> p.q_id
          WHERE p.prn <= greatest({_NPROBE}, (SELECT count(*) FROM c) // 4)),
        ranked AS (
          SELECT q_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
        SELECT q_id, neighbor_id, cos_sim, rank FROM ranked
        WHERE rank <= {_K} ORDER BY q_id, rank""",
    doc="IVF approximate nearest neighbor.  'Training' = the deterministic "
    "centroid sample (k-means stand-in); the centroid table is collected to "
    f"the driver — AT MOST {_CENTROID_CAP} rows at any corpus size, the "
    "sample stride scales with the count — and inlined into "
    "the plan, so CELL ASSIGNMENT IS PURE MAP-SIDE — a per-row argmax over "
    "the broadcast centroid array, no shuffle, no window.  Queries probe "
    f"their {_NPROBE} nearest cells; candidate search is an equi-join on "
    "cell id, so the cross product shrinks to the probed cells' postings.  "
    "At 100 TB the cell assignment scans once map-side and the join "
    "shuffles only (cell, id, vec) for the probed cells.",
)
def s03(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    # "Training": collect the deterministic centroid sample to the driver —
    # exactly the artifact k-means training hands an IVF index — and close
    # over it (Spark broadcasts the normalized matrix with the UDF).  The
    # stride scales with the corpus count so the collect is AT MOST
    # _CENTROID_CAP rows at any SF (the count is a metadata-cheap scalar;
    # a fixed stride would make this driver artifact grow with the corpus).
    stride = _bounded_stride(e.count(), _CENTROID_STRIDE, _CENTROID_CAP)
    cents = (
        e.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    cids = cents["vec_id"].to_numpy()
    cmat = np.vstack(cents["embedding"].to_numpy()).astype("float64")
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    # nprobe scales with the cell count (~25% of cells, floor _NPROBE) so
    # recall holds as the index grows instead of collapsing toward probing a
    # fixed fraction→0 of the space — the standard IVF tuning rule.  The
    # oracle computes the identical greatest(2, count//4).
    nprobe = min(max(_NPROBE, len(cids) // 4), len(cids))

    # Cell assignment is one Arrow-vectorized pass: a (batch × k) gram matrix
    # per batch instead of k interpreted lambda cosines per row (~30× faster,
    # same shape d05 uses).  Ties broken (cos desc, cid asc) — cids ascend in
    # column order, so a stable argsort on -cos matches the oracle exactly.
    @F.pandas_udf("struct<cell: long, probes: array<long>>")
    def assign(emb: pd.Series) -> pd.DataFrame:
        m = np.vstack(emb.to_numpy()).astype("float64")
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        idx = np.argsort(-np.round(m @ cmat.T, 4), axis=1, kind="stable")
        return pd.DataFrame(
            {"cell": cids[idx[:, 0]], "probes": list(cids[idx[:, :nprobe]])}
        )

    # The corpus-wide assign runs ONCE (cells); the probe side re-runs it on
    # only the _N_QUERIES query rows after the pushed-down vec_id filter.
    # explode_outer (identical here: probes is never empty) suppresses
    # InferFiltersFromGenerate's size(a.probes) > 0 filter, which would
    # otherwise re-evaluate the Python UDF a second time per branch.
    cells = e.withColumn("a", assign("embedding")).select(
        "vec_id", "embedding", F.col("a.cell").alias("cell")
    )
    probes = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("a", assign("embedding"))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("qe"),
            F.explode_outer("a.probes").alias("pcell"),
        )
    )
    scored = (
        F.broadcast(probes)
        # eqNullSafe (never-null keys, so ≡ ==) stops Catalyst inferring an
        # isnotnull(cell) filter from the join — that filter pushes below
        # the cells projection and re-evaluates the assign UDF over the
        # whole corpus a second time.
        .join(
            cells,
            F.col("cell").eqNullSafe(F.col("pcell"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_similarity(F.col("qe"), F.col("embedding")), 4).alias("cos_sim"),
        )
    )
    return _rank_topk(scored)


# ---------------------------------------------------------------- s04 k-means update
_KM_K = 8  # centroid count: vec_id < 8 are the seed centroids


def assign_to_centroids(e: DataFrame, cents) -> DataFrame:
    """Map-side nearest-centroid assignment by cosine (ties → lowest
    centroid id): returns (vec_id, embedding, cid, cos).

    In-expression argmax: struct comparison is field-ordered, so the max of
    (cos, -cid) is the highest cosine with ties to the LOWEST centroid id —
    exactly an ``ORDER BY cos DESC, cid`` oracle.  The whole candidate array
    is rendered as ONE SQL expression (a Column-API build of k × dims
    literals costs hundreds of py4j round trips of driver time).  Arithmetic
    is kept bit-identical to dot/( |e| * |c| ) with float64 sequential
    folds: |e| is hoisted and computed once per row (same IEEE value the
    per-centroid fold produced), and each |c| is a literal computed by the
    same sequential square-accumulate the aggregate would run — so DuckDB's
    ``list_cosine_similarity`` over DOUBLE[] reproduces the argmax exactly.
    ``cents`` is a pandas frame of (vec_id, embedding), the tiny driver
    artifact a k-means/IVF iteration consumes; assignment shuffles nothing."""
    import math

    def _cnorm(vec) -> float:
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    ed = "transform(embedding, x -> cast(x as double))"
    na = (
        f"sqrt(aggregate(transform({ed}, x -> x * x), 0.0D, (acc, x) -> acc + x))"
    )

    def _dot(vec) -> str:
        lit = "array(" + ", ".join(repr(float(x)) + "D" for x in vec) + ")"
        return (
            f"aggregate(zip_with({ed}, {lit}, (x, y) -> x * y), 0.0D, "
            f"(acc, x) -> acc + x)"
        )

    cands = "array(" + ", ".join(
        f"named_struct('cos', {_dot(emb)} / (__na * {repr(_cnorm(emb))}D), "
        f"'neg_cid', {-int(cid)}L)"
        for cid, emb in zip(cents["vec_id"], cents["embedding"])
    ) + ")"
    return (
        e.selectExpr("vec_id", "embedding", f"{na} AS __na")
        .selectExpr("vec_id", "embedding", f"array_max({cands}) AS best")
        .selectExpr("vec_id", "embedding", "-best.neg_cid AS cid", "best.cos AS cos")
    )


@query(
    "s04_kmeans_update",
    f"""WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                   WHERE vec_id < {_KM_K}),
        scored AS (
          SELECT e.vec_id, e.embedding, c.cid,
                 list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(c.ce AS DOUBLE[])) AS cos
          FROM embeddings e CROSS JOIN c),
        assign AS (
          SELECT vec_id, embedding, cid, cos,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cid) AS rn
          FROM scored),
        members AS (SELECT * FROM assign WHERE rn = 1),
        dims AS (
          SELECT cid, i, avg(CAST(embedding[i] AS DOUBLE)) AS mu
          FROM members, (SELECT unnest(generate_series(1, 64)) AS i) t
          GROUP BY cid, i),
        norms AS (SELECT cid, sqrt(sum(mu * mu)) AS nrm FROM dims GROUP BY cid)
        SELECT m.cid AS cluster_id, count(*) AS n_members,
               round(avg(m.cos), 4) AS avg_sim,
               round(any_value(n.nrm), 4) AS new_centroid_norm
        FROM members m JOIN norms n ON n.cid = m.cid
        GROUP BY m.cid ORDER BY m.cid""",
)
def s04(spark: SparkSession, sf: str) -> DataFrame:
    """One Lloyd (k-means) update step over the embeddings table: assign
    every vector to its nearest seed centroid by cosine (ties → lowest
    centroid id), then recompute each centroid as the member mean and report
    cluster size, mean member similarity, and the new centroid's L2 norm —
    the building block of distributed embedding clustering (and of real IVF
    training, whose deterministic stand-in s03 uses).

    Scale shape: the k centroids are a tiny driver artifact (exactly what a
    k-means iteration consumes), inlined into the plan as literal arrays, so
    ASSIGNMENT IS A PURE MAP-SIDE EXPRESSION — ``array_max`` over k
    (cos, -cid) structs computed in codegen; no join, no window, no shuffle
    of the corpus.  The update step is the canonical transpose aggregation:
    posexplode(embedding) → partial avg per (cluster, dim) — map-side
    combine keeps the shuffle at k × dims × partitions, independent of
    corpus size."""
    e = load_table(spark, sf, "embeddings")
    cents = (
        e.filter(F.col("vec_id") < _KM_K)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    members = assign_to_centroids(e, cents)
    # r13 audit: a one-pass variant (single groupBy(cid) carrying count,
    # avg(cos) and 64 per-dim avg columns, replacing the dims/stats branch
    # pair that re-evaluates the assignment expression) MEASURED SLOWER at
    # bench scale — min/med of 6 interleaved: 1.34/1.65 s (this shape) vs
    # 1.93/2.53 s (one-pass).  The duplicated branches run as parallel
    # stages on otherwise-idle cores while the wide 66-aggregate pass
    # serializes; same wall-vs-task-time trade the persist audits hit.
    dims = (
        members.select("cid", F.posexplode("embedding").alias("i", "x"))
        .groupBy("cid", "i")
        .agg(F.avg(F.col("x").cast("double")).alias("mu"))
    )
    norms = dims.groupBy("cid").agg(F.sqrt(F.sum(F.col("mu") * F.col("mu"))).alias("nrm"))
    stats = members.groupBy("cid").agg(
        F.count("*").alias("n_members"), F.avg("cos").alias("avg_cos")
    )
    return (
        stats.join(norms, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.round("avg_cos", 4).alias("avg_sim"),
            F.round("nrm", 4).alias("new_centroid_norm"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------- s05 PQ ANN
_PQ_M = 4  # subspaces
_PQ_D = 16  # dims per subspace (embeddings are 64-dim)
_PQ_STRIDE = 7  # vec_id % stride == 0 → deterministic "trained" codebook
_PQ_RERANK = 100  # ADC shortlist depth re-ranked with exact distances

_SQDIST_SQL = (
    "round(list_sum(list_transform(range(1, {d} + 1), i -> "
    "(CAST({a}[j.j * {d} + i] AS DOUBLE) - CAST({b}[j.j * {d} + i] AS DOUBLE)) "
    "* (CAST({a}[j.j * {d} + i] AS DOUBLE) - CAST({b}[j.j * {d} + i] AS DOUBLE))"
    ")), 4)"
)

# exact full-width squared L2 — a sequential left fold in BOTH engines
# (DuckDB list_sum, Spark aggregate()), so the doubles agree bit-for-bit
_EXACT_D2_SQL = (
    "round(list_sum(list_transform(range(1, 65), i -> "
    "(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
    "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), 4)"
)


@query(
    "s05_ann_pq",
    f"""WITH cb AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                    WHERE vec_id % greatest({_PQ_STRIDE},
                      (SELECT (count(*) + {_PQ_CODEBOOK_CAP} - 1) // {_PQ_CODEBOOK_CAP}
                       FROM embeddings)) = 0),
        sub AS (SELECT unnest(range(0, {_PQ_M})) AS j),
        enc AS (
          SELECT e.vec_id, j.j, cb.cid,
                 row_number() OVER (PARTITION BY e.vec_id, j.j ORDER BY
                    {_SQDIST_SQL.format(a='e.embedding', b='cb.ce', d=_PQ_D)} ASC,
                    cb.cid) AS rn
          FROM embeddings e CROSS JOIN cb CROSS JOIN sub j),
        codes AS (SELECT vec_id, j, cid FROM enc WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
              WHERE vec_id < {_N_QUERIES}),
        dtab AS (
          SELECT q.q_id, j.j, cb.cid,
                 {_SQDIST_SQL.format(a='q.qe', b='cb.ce', d=_PQ_D)} AS d2
          FROM q CROSS JOIN cb CROSS JOIN sub j),
        scored AS (
          SELECT d.q_id, c.vec_id AS neighbor_id,
                 sum(CAST(round(d.d2 * 10000) AS BIGINT)) AS approx_e4
          FROM codes c JOIN dtab d ON d.j = c.j AND d.cid = c.cid
          WHERE c.vec_id <> d.q_id
          GROUP BY d.q_id, c.vec_id),
        short AS (
          SELECT q_id, neighbor_id,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY approx_e4 ASC, neighbor_id) AS srn
          FROM scored),
        rr AS (
          SELECT s.q_id, s.neighbor_id,
                 {_EXACT_D2_SQL.format(a='e.embedding', b='q.qe')} AS d2
          FROM short s
          JOIN embeddings e ON e.vec_id = s.neighbor_id
          JOIN q ON q.q_id = s.q_id
          WHERE s.srn <= {_PQ_RERANK}),
        ranked AS (
          SELECT q_id, neighbor_id, d2,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY d2 ASC, neighbor_id) AS rank
          FROM rr)
        SELECT q_id, neighbor_id, d2, rank FROM ranked
        WHERE rank <= {_K} ORDER BY q_id, rank""",
)
def s05(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with exact re-ranking (Jégou et al. 2011,
    public): each vector is compressed to 4 codeword ids (one per 16-dim
    subspace, nearest codeword by squared L2, ties → lowest id); queries
    score the WHOLE corpus with the asymmetric-distance sum of per-subspace
    lookup-table entries, shortlist the ADC top-100, and re-rank the
    shortlist with exact full-width distances — the standard two-stage
    serving shape that lets a 100 TB embedding corpus fit an in-RAM index
    (4 small ints per vector instead of 256 raw bytes) while returning
    exact-quality top-k (`tests/test_oracle.py` pins recall vs exact L2).

    Scale shape: codebooks and the per-query distance tables are tiny
    driver artifacts (exactly what PQ training/serving produces); encoding
    AND ADC scoring fuse into ONE vectorized Arrow pass over the corpus — a
    (batch x k) distance matrix per subspace, then a table gather — so the
    corpus is never joined or shuffled for scoring; only (vec_id, one
    distance per query) rows leave the scan, and the partial WindowGroupLimit
    truncates them map-side.  The re-rank broadcast-joins the ≤ 100×queries
    shortlist back to the corpus scan to fetch raw vectors — the only rows
    ever rehydrated.  Distances are rounded to 4 decimals BEFORE the
    argmin in both engines, making the cross-engine tie-break (lowest
    codeword id) exact; the per-subspace ADC entries — exact multiples of
    1e-4 by that construction — then accumulate as e4 INTEGER units
    (BIGINT sums, order-independent in any join/accumulation order), so
    no float sum exists anywhere in the approximate stage (VERDICT r11);
    the exact re-rank distance is a sequential zip_with/aggregate fold,
    the same left fold DuckDB's list_sum runs."""
    e = load_table(spark, sf, "embeddings")
    # codebook sample stride scales with the corpus count: the driver-side
    # codebook (and the k×… ADC tables/worker gram matrices derived from
    # it) is bounded at _PQ_CODEBOOK_CAP codewords at any SF — without the
    # bound the per-batch ADC distance work grows as corpus², not corpus
    stride = _bounded_stride(e.count(), _PQ_STRIDE, _PQ_CODEBOOK_CAP)
    cents = (
        e.filter(F.col("vec_id") % stride == 0)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    cids = cents["vec_id"].to_numpy()
    cmat = np.vstack(cents["embedding"].to_numpy()).astype("float64")
    qdf = (
        e.filter(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    qids = qdf["vec_id"].to_numpy()
    qmat = np.vstack(qdf["embedding"].to_numpy()).astype("float64")
    nq, k = len(qids), len(cids)

    csub = cmat.reshape(k, _PQ_M, _PQ_D)
    qsub = qmat.reshape(nq, _PQ_M, _PQ_D)
    # dtab_e4[q, j, c] = round(||q_j - c_j||^2, 4) in e4 INTEGER units —
    # the ADC lookup tables.  The round-4 double is an exact multiple of
    # 1e-4, so rint(x * 1e4) recovers the integer exactly; int64 sums are
    # then order-independent (no float accumulation — VERDICT r11).
    dtab_e4 = np.rint(
        np.round(
            ((qsub[:, :, None, :] - csub.transpose(1, 0, 2)[None, :, :, :]) ** 2)
            .sum(-1),
            4,
        )
        * 10000.0
    ).astype(np.int64)

    @F.pandas_udf("array<long>")
    def score(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype("float64").reshape(-1, _PQ_M, _PQ_D)
        total = np.zeros((nq, m.shape[0]), dtype=np.int64)
        for j in range(_PQ_M):
            dd = np.round(((m[:, j, None, :] - csub[None, :, j, :]) ** 2).sum(-1), 4)
            code = dd.argmin(axis=1)  # first min = lowest cid (cids ascend)
            total += dtab_e4[:, j, code]
        return pd.Series(list(total.T))

    scored = (
        e.select("vec_id", score("embedding").alias("ds"))
        # q_id == position: the query set is exactly vec_id 0.._N_QUERIES-1.
        # posexplode_outer (identical: ds always has nq entries) keeps
        # InferFiltersFromGenerate from planting a size(ds) > 0 filter that
        # would re-run the scoring UDF over the whole corpus a second time.
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.posexplode_outer("ds").alias("q_id", "approx_e4"),
        )
        .withColumn("q_id", F.col("q_id").cast("long"))
        .filter(F.col("neighbor_id") != F.col("q_id"))
    )
    wa = Window.partitionBy("q_id").orderBy(F.col("approx_e4").asc(), F.col("neighbor_id"))
    short = (
        scored.withColumn("srn", F.row_number().over(wa))
        .filter(F.col("srn") <= _PQ_RERANK)
        .select("q_id", "neighbor_id")
    )
    qlit = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(qids, qmat)],
        "q_id long, qe array<double>",
    )
    exact_d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("qe"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    rr = (
        F.broadcast(short)
        .join(e.select(F.col("vec_id"), "embedding"), F.col("vec_id") == F.col("neighbor_id"))
        .join(F.broadcast(qlit), "q_id")
        .select("q_id", "neighbor_id", exact_d2.alias("d2"))
    )
    wf = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), F.col("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= _K)
        .select("q_id", "neighbor_id", "d2", "rank")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------- s06 SQ8 ANN
_SQ_DIMS = 64
_SQ_LEVELS = 255
_SQ_SHORTLIST = 100

_SQ_CODE_SQL = (
    f"list_transform(range(1, {_SQ_DIMS} + 1), ci -> CAST(round("
    f"(CAST(embedding[ci] AS DOUBLE) - s.mn[ci]) * {_SQ_LEVELS}"
    f" / greatest(s.mx[ci] - s.mn[ci], 1e-30)) AS BIGINT))"
)


@query(
    "s06_ann_sq8",
    f"""WITH s0 AS (
          SELECT u.di, min(CAST(embedding[u.di] AS DOUBLE)) AS mn,
                 max(CAST(embedding[u.di] AS DOUBLE)) AS mx
          FROM embeddings, UNNEST(range(1, {_SQ_DIMS} + 1)) AS u(di)
          GROUP BY u.di),
        s AS (SELECT list(mn ORDER BY di) AS mn, list(mx ORDER BY di) AS mx
              FROM s0),
        codes AS (SELECT vec_id, {_SQ_CODE_SQL} AS code
                  FROM embeddings CROSS JOIN s),
        q AS (SELECT vec_id AS q_id, code AS qc FROM codes
              WHERE vec_id < {_N_QUERIES}),
        scored AS (
          SELECT q.q_id, c.vec_id AS neighbor_id,
                 list_sum(list_transform(range(1, {_SQ_DIMS} + 1),
                          di -> (q.qc[di] - c.code[di]) * (q.qc[di] - c.code[di])))
                   AS d2_code
          FROM codes c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        short AS (SELECT q_id, neighbor_id, d2_code,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY d2_code ASC, neighbor_id) AS srn
                  FROM scored),
        rr AS (SELECT sh.q_id, sh.neighbor_id,
                      {_EXACT_D2_SQL.format(a='e.embedding', b='qe.embedding')} AS d2
               FROM short sh
               JOIN embeddings e ON e.vec_id = sh.neighbor_id
               JOIN embeddings qe ON qe.vec_id = sh.q_id
               WHERE sh.srn <= {_SQ_SHORTLIST}),
        ranked AS (SELECT q_id, neighbor_id, d2,
                          row_number() OVER (PARTITION BY q_id
                                             ORDER BY d2 ASC, neighbor_id) AS rank
                   FROM rr)
        SELECT q_id, neighbor_id, d2, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {_K} ORDER BY q_id, rank""",
)
def s06(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-quantized (int8) ANN with exact re-ranking — the SQ variant
    every vector store ships beside PQ (s05): per-dimension min/max from
    ONE corpus aggregate become the quantization grid, every vector
    compresses to 64 small ints, and candidate scoring is an INTEGER
    squared-L2 over codes — exact in both engines by construction, no
    float rounding anywhere until the final re-rank.  The code-distance
    top-100 shortlist is re-ranked with exact full-width distances.

    Scale shape: the min/max grid is a 1-row broadcast (like t13's corpus
    stats); quantization is a map-side expression, so the 4x-compressed
    codes — not raw vectors — are what scoring touches; the query side
    broadcasts (s01's shape) and the shortlist truncates map-side through
    the Partial WindowGroupLimit before its q_id exchange; only the
    ≤ shortlist x queries candidate rows rehydrate raw vectors via two
    slim equi-joins.  At 100 TB the corpus is scanned once for stats and
    once for scoring — the honest two-pass any trained quantizer needs."""
    from pyspark.sql import Window

    e = load_table(spark, sf, "embeddings")
    dims = range(1, _SQ_DIMS + 1)
    stats = e.agg(
        F.array(*[F.min(F.element_at("embedding", i).cast("double")) for i in dims]).alias("mn"),
        F.array(*[F.max(F.element_at("embedding", i).cast("double")) for i in dims]).alias("mx"),
    )
    code = F.transform(
        F.sequence(F.lit(1), F.lit(_SQ_DIMS)),
        lambda i: F.round(
            (F.element_at("embedding", i).cast("double") - F.element_at("mn", i))
            * _SQ_LEVELS
            / F.greatest(F.element_at("mx", i) - F.element_at("mn", i), F.lit(1e-30))
        ).cast("long"),
    )
    codes = e.join(F.broadcast(stats)).select("vec_id", code.alias("code"))
    q = codes.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("code").alias("qc")
    )
    d2_code = F.aggregate(
        F.zip_with("qc", "code", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), d2_code.alias("d2_code"))
    )
    ws = Window.partitionBy("q_id").orderBy(F.col("d2_code").asc(), "neighbor_id")
    short = (
        scored.withColumn("srn", F.row_number().over(ws))
        .filter(F.col("srn") <= _SQ_SHORTLIST)
        .select("q_id", "neighbor_id")
    )
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nemb"))
    qe = e.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qemb"))
    exact_d2 = F.round(
        F.aggregate(
            F.zip_with(
                "nemb",
                "qemb",
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("d2").asc(), "neighbor_id")
    return (
        short.join(ne, "neighbor_id")
        .join(F.broadcast(qe), "q_id")
        .select("q_id", "neighbor_id", exact_d2.alias("d2"))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= _K)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------- s07 kNN graph
_GRAPH_K = 3
_GRAPH_CAP = 512  # skew guard: drop LSH buckets larger than this (as d03)

# s07's graph as a reusable CTE chain (ends in `ranked`) — shared with s09,
# which refines this graph by one NN-Descent round
_S07_GRAPH_CTE = f"""b AS (SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings),
        keep AS (SELECT bucket FROM b GROUP BY bucket
                 HAVING count(*) BETWEEN 2 AND {_GRAPH_CAP}),
        scored AS (
          SELECT a.vec_id AS src, e.vec_id AS dst,
                 round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])), 4)
                   AS cos_sim
          FROM b a
          JOIN keep k ON a.bucket = k.bucket
          JOIN b e ON e.bucket = a.bucket AND e.vec_id <> a.vec_id),
        ranked AS (
          SELECT src, dst, cos_sim,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos_sim DESC, dst) AS rank
          FROM scored)"""


@query(
    "s07_knn_graph",
    f"""WITH {_S07_GRAPH_CTE}
        SELECT src, dst, cos_sim, rank FROM ranked
        WHERE rank <= {_GRAPH_K} ORDER BY src, rank""",
    doc="Approximate kNN-graph construction: EVERY vector gets its top-3 "
    "cosine neighbors from within its sign-LSH bucket — the all-vectors "
    "neighbor graph that clustering, SemDeDup-style pruning and "
    "graph-based ANN indexes (NN-Descent seeding) start from, as opposed "
    "to s01–s03's fixed-query search.\n\n"
    "Scale shape: the all-pairs product shrinks to a self equi-join on "
    "bucket id; buckets above the cap drop (mirrored in the oracle's "
    "HAVING, the d03 skew posture) so worst-case pair expansion is "
    "cap²-bounded per bucket (truncation observable via "
    "s08_graph_bucket_audit) — in production the bucket-bit count scales "
    "with log2(n/target_bucket) to hold bucket sizes flat.  Scoring + "
    "ranking run as ONE per-bucket numpy gram matrix inside applyInPandas "
    "(the d05 shape; an interpreted HOF cosine over the pair expansion "
    "measured 4× slower): one bucket exchange, no join, no window, and "
    "only k slim rows per vector leave Python.",
)
def s07(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    b = load_table(spark, sf, "embeddings").withColumn("bucket", _bucket_col())

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"src": [], "dst": [], "cos_sim": [], "rank": []}
        ).astype({"src": "int64", "dst": "int64", "cos_sim": "float64", "rank": "int32"})
        if len(pdf) < 2 or len(pdf) > _GRAPH_CAP:
            return empty
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.vstack(pdf["embedding"].to_numpy())[order].astype("float64")
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        gram = np.round(m @ m.T, 4)  # round BEFORE ranking, as the oracle
        np.fill_diagonal(gram, -np.inf)
        n = len(ids)
        k = min(_GRAPH_K, n - 1)
        # one vectorized stable argsort over the whole gram matrix: columns
        # are already in ascending-id order, so stability IS the (cos desc,
        # dst asc) tie-break — no per-row python loop
        top = np.argsort(-gram, axis=1, kind="stable")[:, :k]
        return pd.DataFrame(
            {
                "src": np.repeat(ids, k),
                "dst": ids[top.ravel()],
                "cos_sim": np.take_along_axis(gram, top, axis=1).ravel(),
                "rank": np.tile(np.arange(1, k + 1), n),
            }
        ).astype({"src": "int64", "dst": "int64", "cos_sim": "float64", "rank": "int32"})

    # The final orderBy's range-sampling pass re-runs its child — without a
    # materialization point the per-bucket gram applyInPandas evaluates
    # TWICE (once for boundary sampling, once for the real sort).  A lazy
    # localCheckpoint of the slim (src, dst, cos_sim, rank) edge output
    # materializes it during the sampling job and the sort reads it back:
    # r13 interleaved A/B (min/med of 6, sf0.1) 1.278/1.975 s ->
    # 0.862/1.568 s, faster in all six rounds.  Same first-principles win
    # at 100 TB: the checkpointed frame is the k-per-vector edge list, tiny
    # next to the corpus pass that produces it.
    return (
        b.repartition("bucket")
        .groupBy("bucket")
        .applyInPandas(bucket_topk, "src long, dst long, cos_sim double, rank int")
        # share_subtree (r14): recoverable persist above the gate, the
        # measured lazy localCheckpoint below it
        .transform(lambda d: share_subtree(d, table_bytes(sf, "embeddings")))
        .orderBy("src", "rank")
    )


# ---------------------------------------------------------------- s08 bucket audit
@query(
    "s08_graph_bucket_audit",
    f"""WITH b AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
        sz AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket)
        SELECT count(*) AS buckets_total,
               CAST(coalesce(sum(CASE WHEN n > {_GRAPH_CAP} THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS buckets_dropped,
               CAST(coalesce(sum(CASE WHEN n > {_GRAPH_CAP} THEN n ELSE 0 END), 0)
                    AS BIGINT) AS vectors_dropped,
               CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS buckets_singleton
        FROM sz""",
    doc="Truncation audit for the capped-bucket similarity operators "
    "(s02/s07): how many sign-LSH buckets exceed the cap and how many "
    f"vectors they contain (cap={_GRAPH_CAP}, s07's), plus singleton "
    "buckets (vectors that can get no neighbors).  The 'no silent caps' "
    "principle: at 100 TB an operator that drops over-cap buckets must "
    "make the truncation observable — run the audit beside the operator "
    "and alert when vectors_dropped is material.  One map-side partial "
    "agg + a single-row final agg; cost is one scan of the bucket ids.",
)
def s08(spark: SparkSession, sf: str) -> DataFrame:
    from .auditing import cap_audit

    b = load_table(spark, sf, "embeddings").withColumn("bucket", _bucket_col())
    sz = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return cap_audit(
        sz, _GRAPH_CAP,
        "buckets_total", "buckets_dropped", "vectors_dropped", "buckets_singleton",
    )


# ---------------------------------------------------------------- s09 NN-Descent round
@query(
    "s09_nn_descent_round",
    f"""WITH {_S07_GRAPH_CTE},
        n AS (SELECT count(*) AS nv FROM embeddings),
        g AS (SELECT src, dst FROM ranked WHERE rank <= {_GRAPH_K}
              UNION
              -- the paper's RANDOM initialization, made deterministic:
              -- {_GRAPH_K} pseudo-random out-edges per vector let the
              -- local-join explore ACROSS LSH buckets
              SELECT e.vec_id AS src,
                     (e.vec_id * 7919 + j * 104729) % n.nv AS dst
              FROM embeddings e CROSS JOIN n
              CROSS JOIN (SELECT unnest(range(1, {_GRAPH_K + 1})) AS j)
              WHERE (e.vec_id * 7919 + j * 104729) % n.nv <> e.vec_id),
        und AS (SELECT src, dst FROM g UNION SELECT dst, src FROM g),
        two AS (SELECT x.src AS src, y.dst AS dst
                FROM und x JOIN und y ON x.dst = y.src),
        cand AS (SELECT DISTINCT src, dst FROM
                   (SELECT src, dst FROM und UNION ALL SELECT src, dst FROM two)
                 WHERE src <> dst),
        rescored AS (
          SELECT c.src, c.dst,
                 round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])), 4)
                   AS cos_sim
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.src
          JOIN embeddings e ON e.vec_id = c.dst),
        reranked AS (
          SELECT src, dst, cos_sim,
                 row_number() OVER (PARTITION BY src
                                    ORDER BY cos_sim DESC, dst) AS rank
          FROM rescored)
        SELECT src, dst, cos_sim, rank FROM reranked
        WHERE rank <= {_GRAPH_K} ORDER BY src, rank""",
    doc="One NN-Descent refinement round (Dong, Moses, Li, WWW 2011): seed "
    "graph = s07's bucketed kNN edges UNION the paper's random "
    "initialization (made deterministic: 3 pseudo-random out-edges per "
    "vector), then each vector's candidate set becomes its neighbors "
    "UNION neighbors-of-neighbors in both directions (the local-join), "
    "re-scored with exact cosine and re-ranked to top-3 — 'a neighbor of "
    "a neighbor is likely a neighbor'.  The random edges are what let "
    "refinement escape LSH bucket boundaries (an in-bucket-only seed's "
    "2-hops stay in-bucket); recall strictly improves over s07's seed "
    "graph (pinned in tests).  This is how graph-ANN indexes (NN-Descent, "
    "HNSW-like construction) are built.\n\n"
    "Scale shape: the 2-hop expansion is an equi-join of the SLIM edge "
    "list with itself (≤ (4k)² candidate rows per vector, k=3 — bounded "
    "by construction, no corpus self-join), then two hash joins fetch "
    "embeddings by vec_id for the exact re-score, and per-src top-k runs "
    "through the Partial+Final WindowGroupLimit pair so the rank exchange "
    "carries at most k rows per src per partition.  Embeddings shuffle "
    "O(candidates), not O(n²) — the honest cost of a local-join round, "
    "and exactly how a production NN-Descent on 100 TB of vectors "
    "iterates (each round one edge self-join + one gather).",
)
def s09(spark: SparkSession, sf: str) -> DataFrame:
    e0 = load_table(spark, sf, "embeddings")
    nv = e0.agg(F.count(F.lit(1)).alias("nv"))
    rnd = (
        e0.select("vec_id")
        .crossJoin(F.broadcast(nv))
        .select(
            "vec_id",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, _GRAPH_K + 1)])
            ).alias("j"),
            "nv",
        )
        .select(
            F.col("vec_id").alias("src"),
            ((F.col("vec_id") * 7919 + F.col("j") * 104729) % F.col("nv")).alias(
                "dst"
            ),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # r13 optimization audit: the s07 subtree is referenced ~6× through the
    # union/self-join chain below and the before-plan is 338 nodes with six
    # FlatMapGroupsInPandas copies — the textbook persist candidate (the
    # d14 posture).  MEASURED the persist variants interleaved at sf0.1
    # (tools/ab_query.py, min/median of 5): none 3.62/4.91 s,
    # persist-all-eager 6.18/6.71, persist-all-lazy 4.82/5.85, g-only-eager
    # 6.98/9.25, g-only-lazy 6.45/7.60, und-only-lazy 3.99/4.71.  Every
    # persist LOSES: the duplicated subtrees run as independent parallel
    # stages that fill otherwise-idle cores (wall time tracks the critical
    # path, not task-time), while a persist adds materialization barriers
    # and an InMemoryRelation statistics wall that downstream join planning
    # can no longer see through.  The knob that DOES win (second r13
    # session, same interleaved A/B): a LAZY localCheckpoint of `g` — the
    # edge list is slim (two longs per row, O(k·n) rows) so materializing
    # it is cheap, lineage truncation drops the six s07-subtree copies
    # from every downstream plan WITHOUT wrapping `g` in an
    # InMemoryRelation statistics wall, and eager=False lets the first
    # downstream job materialize it (no separate barrier job).  Measured
    # interleaved min/med of 5 at sf0.1: plain 4.145/4.622 s vs
    # g-lazy-lckpt 3.830/4.096 — faster in all five rounds; a 4-way run
    # (none/g/und/both) confirmed the `g` placement wins on min.  At
    # production scale the same shape is first-principles right: ONE
    # evaluation of the corpus-pass seed graph instead of ~6, stored as
    # O(edges) longs; recomputability of the truncated lineage is not
    # needed for a within-query intermediate.
    # share_subtree (r14): the seed graph has several CONCURRENT consumers
    # downstream (both und branches, both join sides), so above the gate an
    # EAGER tracked persist both keeps fault tolerance and avoids the
    # lazy-persist cold-cache race; below the gate the lazy localCheckpoint
    # is the measured r13 shape.
    g = (
        s07(spark, sf)
        .select("src", "dst")
        .unionByName(rnd)
        .distinct()
        .transform(
            lambda d: share_subtree(d, table_bytes(sf, "embeddings"), eager=True)
        )
    )
    und = g.unionByName(
        g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    two = (
        und.alias("x")
        .join(und.alias("y"), F.col("x.dst") == F.col("y.src"))
        .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
    )
    # cand is symmetric by construction (und is, so its 2-hops are):
    # score each UNORDERED pair once, mirror afterwards — halves the
    # cosine work with bit-identical values
    up = (
        und.unionByName(two)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    # per-vector norms computed ONCE and joined in: cos = dot/(nu*nv) with
    # the exact same fp expressions cosine_similarity evaluates per pair,
    # so values (and the round-4 hash) are bit-identical at a third of the
    # per-pair aggregate work.  array<float> -> array<double> is ONE codegen
    # Cast (not an interpreted per-element transform; same exact widening)
    # and the norm is a single fold (acc + x*x) — the same multiplies and
    # adds in the same order as transform-then-fold, one array
    # materialization less.
    ad = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", ad.alias("ed"), nrm.alias("nrm")
    )
    a = e.select(
        F.col("vec_id").alias("u"), F.col("ed").alias("ue"), F.col("nrm").alias("un")
    )
    b = e.select(
        F.col("vec_id").alias("v"), F.col("ed").alias("ve"), F.col("nrm").alias("vn")
    )
    dot = F.aggregate(
        F.zip_with("ue", "ve", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored_u = (
        up.join(a, "u")
        .join(b, "v")
        .select(
            "u", "v", F.round(dot / (F.col("un") * F.col("vn")), 4).alias("cos_sim")
        )
    )
    # mirror each unordered pair with ONE explode over the scored row — a
    # unionByName of two scored_u selects re-evaluates the entire
    # candidate+join+score subtree per branch (no cross-branch CSE in
    # Catalyst); same (q_id, neighbor_id, cos_sim) multiset.  r13 A/B
    # (interleaved min/med of 5, sf0.1): union 3.82/4.47 s, explode
    # 3.58/4.14; two rejected-by-measurement variants are recorded in
    # OPTIMIZATION_r13.md (a 64-wide codegen unroll of the dot: slower;
    # a mapInPandas numpy rescore: much slower — Arrow-shipping 2x64
    # floats per candidate pair dwarfs the interpreted-fold saving).
    rescored = scored_u.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("q_id"), F.col("v").alias("neighbor_id")),
                F.struct(F.col("v").alias("q_id"), F.col("u").alias("neighbor_id")),
            )
        ).alias("m"),
        "cos_sim",
    ).select("m.q_id", "m.neighbor_id", "cos_sim")
    # r14 width-pin experiments, both measured and REJECTED (interleaved
    # A/B at sf0.1, 6-8 rounds): (a) pinning the v-side join exchange to
    # core count spread the interpreted dot fold but moved no wall (the
    # fold is ~0.3 task-seconds across 2 tasks — not the bottleneck);
    # (b) pinning the rank window's q_id exchange widened the final
    # row_number stage but DROPPED the Partial WindowGroupLimit (the
    # optimizer does not push it below a user repartition), growing the
    # exchange, and was also a wall wash.  The residual s09 wall at bench
    # scale is driver/job latency over the ~10-job checkpoint+broadcast
    # chain, not any single stage.
    out = _rank_topk(rescored, _GRAPH_K)
    return out.select(
        F.col("q_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "cos_sim",
        F.col("rank").cast("long").alias("rank"),
    ).orderBy("src", "rank")

"""Multimodal pipeline queries (m01–m03) over the media view of documents.

All three are fully DuckDB-oracle-checked: m01's ids/kinds/sizes are
deterministic SQL; m02's digest is defined over exact integer byte-moments
and m03 fingerprints each sampled frame, both reproducible in SQL because
the corpus is ASCII (char positions are byte positions).  The Spark-side
plumbing is additionally exercised structurally in
tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features, sample_frames
from ..tables import load_table
from .registry import query


@query(
    "m01_media_stats",
    """SELECT doc_id AS media_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS kind,
              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
       FROM documents ORDER BY media_id""",
    doc="Media catalog stats: binary payload sizes by kind — the metadata "
    "scan a media pipeline runs before any decode.",
)
def m01(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf, "documents"))
    return (
        media.select("media_id", "kind", F.octet_length("data").cast("long").alias("n_bytes"))
        .orderBy("media_id")
    )


@query(
    "m02_media_features",
    """WITH m AS (SELECT doc_id AS media_id,
                         CASE WHEN doc_id % 3 = 0 THEN 'image'
                              WHEN doc_id % 3 = 1 THEN 'audio'
                              ELSE 'video' END AS kind,
                         text, length(text) AS n
                  FROM documents),
        pos AS (SELECT media_id, text, unnest(generate_series(1, n)) AS p
                FROM m),
        b AS (SELECT media_id, (p - 1) % 8 AS j, ord(substr(text, p, 1)) AS byte
              FROM pos),
        mom AS (SELECT media_id, j, CAST(sum(byte) AS BIGINT) AS s,
                       count(*) AS c
                FROM b GROUP BY media_id, j),
        -- full (media_id x stride) grid: documents shorter than 8 bytes
        -- have empty strides, which the operator pads as sum 0 / count 1
        grid AS (SELECT media_id, unnest(generate_series(0, 7)) AS j FROM m),
        filled AS (SELECT g.media_id, g.j,
                          coalesce(mom.s, 0) AS s,
                          coalesce(mom.c, 1) AS c
                   FROM grid g LEFT JOIN mom USING (media_id, j)),
        d AS (SELECT media_id,
                     md5(string_agg(s || '/' || c, ',' ORDER BY j)) AS features_digest
              FROM filled GROUP BY media_id)
        SELECT m.media_id, m.kind, CAST(m.n AS BIGINT) AS n_bytes,
               CAST(16 + m.n % 64 AS INTEGER) AS width,
               CAST(16 + (m.n // 64) % 64 AS INTEGER) AS height,
               d.features_digest
        FROM m JOIN d USING (media_id) ORDER BY media_id""",
    doc="Arrow-batched feature extraction over binary payloads "
    "(mapInPandas; deterministic fake decode documented in "
    "operators/multimodal.py). Emits features_digest = md5 of the exact "
    "integer byte-moments, reproduced byte-for-byte by the SQL oracle "
    "(the corpus is ASCII, so char positions are byte positions).",
)
def m02(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf, "documents"))
    return extract_features(media).orderBy("media_id")


@query(
    "m03_frame_sample",
    """WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n
                  FROM documents WHERE doc_id % 3 = 2),
        f AS (SELECT media_id,
                     CAST(i AS INTEGER) AS frame_idx,
                     substr(text, i * 256 + 1, 256) AS frame
              FROM m, generate_series(0, 3) t(i)
              WHERE i < least(4, greatest(1, n // 256)))
        SELECT media_id, frame_idx,
               CAST(length(frame) AS BIGINT) AS n_bytes,
               md5(frame) AS frame_digest
        FROM f ORDER BY media_id, frame_idx""",
    doc="Video frame sampling: mapInPandas row expansion (1 video → ≤4 "
    "frames).  The driver-facing query fingerprints each frame (md5) so "
    "the oracle hash-checks it; the library operator keeps raw bytes.",
)
def m03(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf, "documents"))
    return (
        sample_frames(media)
        .select(
            "media_id",
            "frame_idx",
            "n_bytes",
            F.md5("frame_data").alias("frame_digest"),
        )
        .orderBy("media_id", "frame_idx")
    )

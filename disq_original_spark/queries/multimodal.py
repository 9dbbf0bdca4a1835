"""Multimodal pipeline queries (m01–m03) over the media view of documents.

m01 is fully oracle-checkable (ids/kinds/sizes are deterministic SQL); the
decode-dependent ops (m02/m03) are rows-only — their Spark-side plumbing is
exercised structurally in tests/test_multimodal.py."""

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
    None,  # decode is a deterministic fake — structural/rows-only check
    doc="Arrow-batched feature extraction over binary payloads "
    "(mapInPandas; deterministic fake decode documented in "
    "operators/multimodal.py). Emits a scalar features_digest (md5 of the "
    "rounded vector) so every output column is sortable/hashable.",
)
def m02(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf, "documents"))
    return extract_features(media).orderBy("media_id")


@query(
    "m03_frame_sample",
    None,
    doc="Video frame sampling: mapInPandas row expansion (1 video → ≤4 frames).",
)
def m03(spark: SparkSession, sf: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf, "documents"))
    return sample_frames(media).orderBy("media_id", "frame_idx")

"""Text-analysis operators for a large-scale training-data pipeline
(t01–t04): token counting, quality scoring, language heuristic, document
fingerprinting.  All native column expressions over the ``documents`` table;
each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import (
    STOPWORDS,
    normalized_fingerprint,
    punct_count,
    stopword_count,
    tokens,
)
from ..tables import load_table
from .registry import query

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


# ---------------------------------------------------------------- t01 token count
@query(
    "t01_token_count",
    r"""SELECT doc_id,
               len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
               length(trim(text)) AS n_chars_norm
        FROM documents ORDER BY doc_id""",
)
def t01(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.select(
            "doc_id",
            F.size(tokens("text")).alias("n_tokens"),
            F.length(F.trim(F.col("text"))).alias("n_chars_norm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- t02 quality score
@query(
    "t02_quality_score",
    rf"""SELECT doc_id, n_tokens, n_stop,
                round(CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END, 4) AS stop_ratio,
                round(CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0 END, 4) AS punct_ratio,
                round(least(n_tokens / 100.0, 1.0)
                      * (1 - CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0 END), 4) AS quality
         FROM (
           SELECT doc_id,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) AS n_tokens,
                  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                       x -> x IN {_STOP_SQL})) AS DOUBLE) AS n_stop,
                  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) AS n_punct,
                  CAST(length(text) AS DOUBLE) AS n_chars
           FROM documents) t
         ORDER BY doc_id""",
    doc="Length/stopword/punctuation quality heuristic — the classic cheap "
    "pre-filter for LLM training corpora; one narrow projection, no shuffle.",
)
def t02(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    tok = tokens("text")
    base = d.select(
        "doc_id",
        F.size(tok).cast("double").alias("n_tokens"),
        stopword_count(tok).cast("double").alias("n_stop"),
        punct_count("text").cast("double").alias("n_punct"),
        F.length("text").cast("double").alias("n_chars"),
    )
    stop_ratio = F.when(F.col("n_tokens") > 0, F.col("n_stop") / F.col("n_tokens")).otherwise(0.0)
    punct_ratio = F.when(F.col("n_chars") > 0, F.col("n_punct") / F.col("n_chars")).otherwise(0.0)
    return (
        base.select(
            "doc_id",
            "n_tokens",
            "n_stop",
            F.round(stop_ratio, 4).alias("stop_ratio"),
            F.round(punct_ratio, 4).alias("punct_ratio"),
            F.round(F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * (1 - stop_ratio), 4).alias(
                "quality"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- t03 language heuristic
@query(
    "t03_lang_heuristic",
    rf"""SELECT doc_id,
                CASE WHEN len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                          x -> x IN {_STOP_SQL})) >= 3 THEN 'en'
                     ELSE 'unk' END AS lang_pred
         FROM documents ORDER BY doc_id""",
    doc="Stopword-profile language heuristic (n-gram language-ID would swap in "
    "a per-language profile table joined by broadcast; structure identical).",
)
def t03(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    n_stop = stopword_count(tokens("text"))
    return (
        d.select(
            "doc_id",
            F.when(n_stop >= 3, "en").otherwise("unk").alias("lang_pred"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- t04 fingerprint
@query(
    "t04_fingerprint",
    r"""SELECT doc_id,
               substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 16) AS fp
        FROM documents ORDER BY doc_id""",
)
def t04(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.select("doc_id", normalized_fingerprint("text").alias("fp")).orderBy("doc_id")

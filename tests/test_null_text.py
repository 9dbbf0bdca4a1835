"""Engine-parity on degenerate documents: a corpus containing NULL-text,
empty-text and one-word rows must produce IDENTICAL Spark and DuckDB results
for the document-pipeline queries.  The driver's fixtures contain no such
rows, so without this sweep a NULL-handling divergence (e.g. a pure
projection emitting an all-NULL row the oracle drops) stays latent until a
real corpus hits it."""

from __future__ import annotations

import shutil

import duckdb
import pytest

from disq_original_spark.queries import QUERIES

from .conftest import SF_DIR
from .util import assert_frames_match

# document-table queries whose oracle must stay row-for-row identical when
# degenerate rows are present (similarity/packing queries over embeddings
# or events are untouched by document text)
_DOC_QUERIES = [
    "t01_token_count",
    "t02_quality_score",
    "t03_lang_heuristic",
    "t04_fingerprint",
    "t05_bpe_tokens",
    "t11_quality_classifier",
    "t12_filter_funnel",
    "t13_bm25",
    "t14_bigram_surprisal",
    "d01_exact_dedup",
    "p01_sequence_packing",
    "p02_stratified_sample",
    "p03_budget_mixture",
    "p05_corpus_pipeline",
    "d11_paragraph_dedup",
    "p08_domain_cap",
    "m01_media_stats",
    "m02_media_features",
    "m03_frame_sample",
    "m04_phash_neardup",
    "m05_audio_frames",
    "m06_scene_cuts",
]


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """sf0.001 with three degenerate documents appended: NULL text, empty
    text, one word.  All other tables are the originals."""
    root = tmp_path_factory.mktemp("degenerate_sf")
    for f in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copy(f"{SF_DIR}/{f}.parquet", root / f"{f}.parquet")
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # 900000 % 3 == 0 AND % 15 == 0: the empty-text doc IS an m04 image and
    # a near-dup variant source, exercising perceptual_hash's empty-payload
    # skip on exactly the path m04 scores; 900003 % 3 == 0 puts the one-word
    # doc through the image hash too (mostly-empty strides); 900002/900005
    # % 3 == 2 are NULL- and short-text VIDEOS — the class whose spurious
    # all-NULL oracle frame row m03 previously missed (DuckDB least/greatest
    # ignore NULLs); 900004 % 3 == 1 is a NULL-text audio doc for m05
    extra = spark.createDataFrame(
        [
            (900000, "", "en", "srcX", 0),
            (900001, None, "en", "srcX", 0),
            (900003, "spark", "en", "srcX", 5),
            (900002, None, "en", "srcX", 0),
            (900004, None, "en", "srcX", 0),
            (900005, "clip", "en", "srcX", 4),
        ],
        d.schema,
    )
    d.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet")
    )
    return str(root)


@pytest.fixture(scope="module")
def degenerate_ddb(degenerate_sf):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degenerate_sf}/{t}.parquet/*.parquet')"
        ) if t == "documents" else con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{degenerate_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_query_agrees_on_degenerate_docs(spark, degenerate_sf, degenerate_ddb, name):
    q = QUERIES[name]
    spark_pdf = q.build(spark, degenerate_sf).toPandas()
    oracle_pdf = degenerate_ddb.sql(q.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)

"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every declared operator from SURVEY.md §2.9 plus the
training-data operators (dedup / similarity / text analysis / interval);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each hash-checkable one.
Both are backed by ``disq_original_spark.queries.QUERIES``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from disq_original_spark.cache import release_persists  # noqa: E402
from disq_original_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 core (q10)."""
    return QUERIES["q10_hash_aggregate"].build(spark, "/root/testdata/sf0.001")


def _released(name: str) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a builder so each build first releases the PREVIOUS build's
    tracked persists (cache hygiene over the driver's 145-query sweep —
    VERDICT r4).  The current build's persists stay alive for the caller's
    subsequent drain; releasing them at the next build is correctness-
    neutral (Spark recomputes from lineage) and bounds resident cached
    blocks to one query's worth at any time."""

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_persists()
        return QUERIES[name].build(spark, sf_dir)

    return build


# The driver's CORRECTNESS harness records rows for the first 50 names in
# queries()' iteration order each round (observed rounds 1 and 2).  queries()
# therefore returns a dict whose iteration order front-loads the names that
# most need a fresh driver row, so the bounded checker covers every operator
# across a rolling window of rounds.  All registered queries are always
# present — only the ordering is prioritized.
#
# Round-6 rotation (VERDICT r5 directive #1 — pure rotation round): the
# backlog after r5 is 57 candidates for 50 slots, composed here as
#   (a) q01/q02 — latest witness r2, the missed r4 "nothing older than
#       round 3" criterion;
#   (b) the 7 genomics conversions g09/g19-g24 whose parquet-twin oracles
#       landed in r5 AFTER their last (rows-only, r4) driver row — first
#       driver hash witness;
#   (c) s03/s05 — centroid-cap code change THIS round (plus r3-stale);
#   (d) p04 (named by the directive) and 38 of the remaining 45
#       r3-witnessed queries.
# Deliberately deferred to the round-7 window (the directive's documented
# spill, leftover = exactly 7 from the 57-candidate pool):
#   q29_case q30_tumbling_window q31_sessionize q32_percentiles q33_pivot
#   q41_unpivot q42_grouping_sets
# plus the round-6 code-changed re-witnesses (rule: code changed =>
# re-witness next round): q12_approx_distinct (new hash-checkable
# companion form), t17_heavy_hitters (runtime exactness guard),
# g25/g26 (multi-Parent explode), d03/d04/d14 (selective eager persist
# in their shared dedup frames), g09 (dupmark plan-shape change under
# materialized caches), and the m04/m05/m06 real-codec re-witnesses
# (r5 payload change postdates their r4 rows).  All of these are
# exact-green locally via tools/simulate_driver_window.py --all
# (final r6 tree: window 50/50 AND full registry 145/145, BAD: {}).
_PRIORITY = [
    # --- (a) oldest witnesses in the registry (r2) ---
    "q01_scan_project",
    "q02_filter",
    # --- (b) first driver hash rows: oracles postdate their last row ---
    "g09_mark_duplicates",
    "g19_gc_windows",
    "g20_kmer_spectrum",
    "g21_cpg_islands",
    "g22_roh_runs",
    "g23_bcf_stats",
    "g24_bam_to_fastq",
    # --- (c) code changed this round: bounded centroid/codebook sample ---
    "s03_ann_ivf",
    "s05_ann_pq",
    # --- (d) directive-named + stalest r3 block ---
    "p04_shard_assignment",
    "d09_incremental_dedup",
    "d10_semdedup",
    "p02_stratified_sample",
    "p05_corpus_pipeline",
    "p06_importance_resampling",
    "q05_broadcast_join",
    "q06_left_outer_join",
    "q07_semi_join",
    "q08_anti_join",
    "q09_range_join",
    "q10_hash_aggregate",
    "q11_distinct_aggregate",
    "q13_rollup",
    "q14_cube",
    "q15_window_rank",
    "q16_window_frame",
    "q17_lag",
    "q18_topk",
    "q19_union_all",
    "q20_intersect",
    "q21_except",
    "q22_string_functions",
    "q23_date_functions",
    "q24_math",
    "q25_array_agg",
    "q26_json_access",
    "q27_explode",
    "q28_exists_subquery",
    "s01_knn_bruteforce",
    "s02_ann_bucketed",
    "s04_kmeans_update",
    "st05_stateful_totals",
    "st06_stream_sliding",
    "st07_stream_static_join",
    "t08_gopher_repetition",
    "t10_unigram_surprisal",
    "t11_quality_classifier",
    "t12_filter_funnel",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in sorted(QUERIES) if n not in set(_PRIORITY)]
    return {name: _released(name) for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle is not None}

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

from disq_original_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 core (q10)."""
    return QUERIES["q10_hash_aggregate"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle is not None}

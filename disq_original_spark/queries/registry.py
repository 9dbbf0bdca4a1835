"""Registry mapping query name → (DataFrame builder, DuckDB oracle SQL).

Builders take ``(spark, sf_dir)`` and return an *unexecuted* DataFrame so that
plans can be inspected (tests assert pushdown/broadcast properties on them).
DELIBERATE EXCEPTION: the ``st*`` streaming builders execute a bounded
availableNow readStream→memory-sink drain inside build() (a streaming plan
cannot be returned as a batch DataFrame) — plan-inspection sweeps over the
whole registry should expect those eight to run real work.
Column names are aliased identically in the builder and the oracle — the
driver's hash compare sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: Builder
    oracle: str | None  # DuckDB SQL; None → rows-only check (non-SQL op)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator registering a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap

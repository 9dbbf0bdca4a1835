"""Shared shape of the capped-blocking truncation audits (s08/d13/t16).

Every capped-bucket operator family pairs with one audit query reporting
how much the cap silently dropped; the aggregate is identical across
families — only the key column names and the cap differ — so it lives
here once."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cap_audit(
    sized: DataFrame,
    cap: int,
    total: str,
    dropped: str,
    items_dropped: str,
    singleton: str,
    n: str = "n",
) -> DataFrame:
    """One-row audit over a (key..., n) size frame: total keys, keys over
    ``cap`` (whose candidate pairs are never generated), the postings/items
    those keys carry, and singleton keys (which can never pair).  All
    BIGINT, coalesced to 0 on empty input — hash-identical to the oracles'
    ``CAST(coalesce(sum(CASE ...), 0) AS BIGINT)`` form."""
    over = F.col(n) > cap
    return sized.agg(
        F.count(F.lit(1)).alias(total),
        F.coalesce(F.sum(over.cast("long")), F.lit(0)).alias(dropped),
        F.coalesce(
            F.sum(F.when(over, F.col(n)).otherwise(F.lit(0))), F.lit(0)
        ).alias(items_dropped),
        F.coalesce(F.sum((F.col(n) == 1).cast("long")), F.lit(0)).alias(singleton),
    )

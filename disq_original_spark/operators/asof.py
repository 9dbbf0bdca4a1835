"""As-of join: for each left row, the most recent right row at or before it.

Spark has no built-in as-of join (pandas has ``merge_asof``; DuckDB has
``ASOF JOIN``).  The scalable formulation is NOT a join at all: tag both
sides, union them, and run one window pass per key ordered by time —
``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
carries the latest right row forward onto every left row.

Scale properties (the reason for this shape):
- ONE hash shuffle on the key columns — the same shuffle a groupBy would do;
  no join, so no build side, no skew amplification, no range-join explosion.
- State per partition during the window pass is a single right-payload row
  (the running ``last``), independent of key cardinality or time range.
- A naive ``JOIN ON key AND r.ts <= l.ts`` + row_number would expand every
  left row by its full right history before pruning; at 100 TB that
  intermediate is quadratic in events-per-key.  The union-window form never
  materializes it.

Semantics match ``ASOF LEFT JOIN`` / ``merge_asof(direction='backward')``:
a right row with ``right_ts == left_ts`` matches (ties sort right-before-left
inside the window).  Among multiple right rows at the same (key, ts) the one
greatest by ``tiebreak`` wins, making the result total-order deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join of ``right`` onto ``left``.

    Returns ``left``'s columns plus ``right``'s non-key, non-ts payload
    columns (null where no right row is at-or-before the left row).  The
    matched right timestamp is exposed as ``_asof_ts``.

    - ``on``: equality key columns (present in both sides).
    - ``left_ts`` / ``right_ts``: event-time columns.
    - ``tiebreak``: optional right column deciding equal-timestamp ties
      (greatest wins); required for determinism if (key, right_ts) can repeat.
    - ``tolerance``: optional SQL interval literal body (e.g. ``"30 days"``);
      matches older than ``left_ts - tolerance`` are nulled out.
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = (set(payload) | {"_asof_ts"}) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output would contain duplicate columns {sorted(clash)}; "
            "rename the right payload (or left) columns first"
        )
    rstruct = F.struct(
        F.col(right_ts).alias("_asof_ts"), *[F.col(c) for c in payload]
    )
    rtype = right.select(rstruct.alias("_r")).schema["_r"].dataType

    # _tie keeps the tiebreak column's OWN type (any orderable type works in
    # a window ORDER BY); casting to long would silently null non-numeric
    # tiebreaks and void the determinism guarantee.
    tie_type = right.schema[tiebreak].dataType if tiebreak else "long"
    order = [F.col(right_ts).alias("_ts"), F.lit(0).alias("_side")]
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(rtype).alias("_r"),
    )
    r2 = right.select(
        *on,
        *order,
        (F.col(tiebreak) if tiebreak else F.lit(None).cast(tie_type)).alias("_tie"),
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        rstruct.alias("_r"),
    )
    # Right rows sort before left rows at equal _ts (side 0 < 1), so an
    # equal-timestamp right row IS visible to the left row — the >= contract.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    out = (
        l2.unionByName(r2)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        too_old: Column = F.col("_m._asof_ts") < F.col("_ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.withColumn(
            "_m", F.when(too_old, F.lit(None).cast(rtype)).otherwise(F.col("_m"))
        )
    return out.select("_l.*", "_m.*")

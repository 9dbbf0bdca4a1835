"""Sequence packing for LLM training pipelines (p01).

Packing concatenates documents into fixed token-budget training sequences so
a trainer wastes no context-window slots on padding.  The globally-greedy
variant is inherently sequential, so it cannot scale; the standard scalable
formulation (used by T5/LLM data pipelines) packs *within independent
buckets*:

- every document is hashed into one of ``_N_BUCKETS`` buckets
  (``doc_id % _N_BUCKETS`` here, so the result is deterministic and the
  DuckDB oracle can reproduce it),
- documents within a bucket are processed in ``doc_id`` order with the
  next-fit rule at capacity ``_CAPACITY`` tokens: append to the current
  sequence if it fits, else start a new sequence (an oversized document
  occupies a sequence of its own),
- buckets are packed in parallel — one ``applyInPandas`` group each.

Scale: one hash shuffle on the bucket key; per-bucket state is O(1) (a
running token count), so bucket count — not corpus size — bounds parallelism
and no executor ever materializes more than its bucket.  At 100 TB you raise
``_N_BUCKETS`` to ~cores and the plan is unchanged.

The packing loop itself is a per-bucket Python loop over an Arrow batch:
next-fit is a reset-on-overflow running sum, which has no vectorized form,
but it is O(rows) with trivial constants and runs inside the Arrow pass.

Oracle: the same next-fit recurrence expressed as a DuckDB recursive CTE
walking each bucket in ``doc_id`` order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tokens
from ..tables import load_table
from .registry import query

_N_BUCKETS = 8
_CAPACITY = 256

_PACKED_SCHEMA = "bucket long, seq_idx long, n_docs long, seq_tokens long"


def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    seqs: list[tuple[int, int]] = []  # (n_docs, tokens) per sequence
    acc = None
    for toks in pdf["toks"].to_numpy():
        toks = int(toks)
        if acc is not None and acc + toks <= _CAPACITY:
            n, t = seqs[-1]
            seqs[-1] = (n + 1, t + toks)
            acc += toks
        else:
            seqs.append((1, toks))
            acc = toks
    bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
    return pd.DataFrame(
        {
            "bucket": bucket,
            "seq_idx": range(len(seqs)),
            "n_docs": [n for n, _ in seqs],
            "seq_tokens": [t for _, t in seqs],
        }
    )


@query(
    "p01_sequence_packing",
    rf"""WITH RECURSIVE d AS (
           SELECT doc_id, doc_id % {_N_BUCKETS} AS bucket,
                  len(string_split_regex(lower(trim(text)), '\s+')) AS toks,
                  row_number() OVER (PARTITION BY doc_id % {_N_BUCKETS}
                                     ORDER BY doc_id) AS rn
           FROM documents),
         packed AS (
           SELECT bucket, rn, toks, 0::BIGINT AS seq_idx, toks AS acc
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.bucket, d.rn, d.toks,
                  CASE WHEN p.acc + d.toks <= {_CAPACITY}
                       THEN p.seq_idx ELSE p.seq_idx + 1 END,
                  CASE WHEN p.acc + d.toks <= {_CAPACITY}
                       THEN p.acc + d.toks ELSE d.toks END
           FROM packed p JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1)
         SELECT bucket, seq_idx, count(*) AS n_docs,
                CAST(sum(toks) AS BIGINT) AS seq_tokens,
                round(sum(toks) / {_CAPACITY}.0, 4) AS fill
         FROM packed GROUP BY bucket, seq_idx ORDER BY bucket, seq_idx""",
    doc="Bucketed next-fit sequence packing at a fixed token budget — the "
    "scalable form of training-sequence packing (independent buckets, O(1) "
    "state per bucket).",
)
def p01(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        (F.col("doc_id") % _N_BUCKETS).alias("bucket"),
        F.size(tokens("text")).cast("long").alias("toks"),
    )
    return (
        d.groupBy("bucket")
        .applyInPandas(_pack_bucket, schema=_PACKED_SCHEMA)
        # fill is rounded JVM-side: F.round is HALF_UP, matching DuckDB's
        # half-away-from-zero on positive values (Python's round() is
        # half-to-even and disagrees at e.g. 232/256 = 0.90625).
        .withColumn("fill", F.round(F.col("seq_tokens") / float(_CAPACITY), 4))
        .orderBy("bucket", "seq_idx")
    )

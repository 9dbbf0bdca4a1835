"""t19 per-document TF-IDF keywords: exact parity with a Python brute
force on synthetic corpora (ties, sub-K documents, duplicate terms),
micro-rounded integer ranking, and the WindowGroupLimit plan contract.
Whole-corpus oracle parity runs in tests/test_oracle.py."""

from __future__ import annotations

import math

from disq_original_spark.queries import QUERIES
import disq_original_spark.queries.textops as tx


def _brute(docs, k):
    toks = {
        i: [t for t in text.lower().split() if t]
        for i, text in docs
        if text is not None and any(text.split())
    }
    n = len(toks)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (
                t,
                c,
                df[t],
                math.floor(
                    c * (math.log((n + 1.0) / (df[t] + 1.0)) + 1.0) * 1e6 + 0.5
                ),
            )
            for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        out[i] = [
            (r + 1, t, c, d, s) for r, (t, c, d, s) in enumerate(scored[:k])
        ]
    return out


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    orig = tx.load_table
    tx.load_table = lambda s, sf, name: df
    try:
        rows = QUERIES["t19_keyword_tfidf"].build(spark, "ignored").collect()
    finally:
        tx.load_table = orig
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["score_micro"])
        )
    return got


def test_matches_bruteforce(spark):
    docs = [
        (0, "apple apple banana cherry date"),
        (1, "banana banana banana apple"),
        (2, "unique solo tokens everywhere here six"),  # > K distinct terms
        (3, "tie tie bye bye"),                          # equal tf ties
        (4, None),
        (5, "   "),
        (6, "apple"),                                    # sub-K document
    ]
    assert _run(spark, docs) == _brute(docs, tx._T19_K)


def test_idf_downweights_ubiquitous_terms(spark):
    """A term present in EVERY document must rank below an equally
    frequent rare term — the property that makes this TF-IDF and not a
    raw frequency count."""
    docs = [(i, f"common rare{i} rare{i}") for i in range(10)]
    got = _run(spark, docs)
    for i in range(10):
        assert got[i][0][1] == f"rare{i}"
        assert got[i][1][1] == "common"


def test_plan_window_group_limit_no_python(spark, sf_dir):
    df = QUERIES["t19_keyword_tfidf"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "EvalPython" not in plan

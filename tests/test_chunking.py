"""t18 sliding-window chunking: exact window math against a Python
reference on synthetic corpora (full windows, overlap, tails, boundary
lengths), degenerate-document posture, fingerprint integrity, and the
no-shuffle plan contract.  Whole-corpus oracle parity runs in
tests/test_oracle.py like every registered query."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from disq_original_spark.queries import QUERIES
import disq_original_spark.queries.textops as tx


def _ref_chunks(tokens: list[str], w: int, s: int) -> list[tuple[int, int, str]]:
    """Reference implementation: chunk k covers tokens [k·s, k·s+w) while
    k·s < n (0-based), i.e. k in 0..(n-1)//s."""
    out = []
    n = len(tokens)
    for k in range((n - 1) // s + 1):
        ct = tokens[k * s : k * s + w]
        out.append(
            (k, len(ct), hashlib.md5(" ".join(ct).encode()).hexdigest())
        )
    return out


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    orig = tx.load_table
    tx.load_table = lambda s, sf, name: df
    try:
        rows = QUERIES["t18_chunk_windows"].build(spark, "ignored").collect()
    finally:
        tx.load_table = orig
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_fp"])
        )
    return got


def test_window_math_matches_reference(spark):
    w, s = tx._T18_W, tx._T18_S
    lengths = [1, s - 1, s, s + 1, w - 1, w, w + 1, 2 * s, 2 * s + 1,
               3 * w + 5, 97]
    docs = [
        (i, " ".join(f"tok{i}_{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    got = _run(spark, docs)
    for i, n in enumerate(lengths):
        tokens = [f"tok{i}_{j}" for j in range(n)]
        assert got[i] == _ref_chunks(tokens, w, s), (i, n)


def test_overlap_and_coverage_properties(spark):
    """Consecutive full chunks share exactly W−S tokens, every token is
    covered by ≥1 chunk, and interior chunk starts advance by S."""
    w, s = tx._T18_W, tx._T18_S
    n = 5 * s + 7
    tokens = [f"t{j}" for j in range(n)]
    got = _run(spark, [(0, " ".join(tokens))])[0]
    assert [k for k, _n, _f in got] == list(range((n - 1) // s + 1))
    covered = set()
    for k, ln, fp in got:
        ct = tokens[k * s : k * s + w]
        assert ln == len(ct)
        assert fp == hashlib.md5(" ".join(ct).encode()).hexdigest()
        covered.update(range(k * s, k * s + ln))
    assert covered == set(range(n))


def test_degenerate_documents_drop(spark):
    got = _run(
        spark,
        [(0, None), (1, ""), (2, "   \t\n "), (3, " one  two ")],
    )
    assert set(got) == {3}
    assert got[3] == _ref_chunks(["one", "two"], tx._T18_W, tx._T18_S)


def test_text_not_normalized(spark):
    """Chunks must preserve the original text: no lowercasing, no Unicode
    whitespace normalization (NBSP is a TOKEN character here)."""
    toks = ["FOO", "\xa0Bar", "baz!"]
    got = _run(spark, [(0, "FOO \xa0Bar baz!")])
    assert got[0] == _ref_chunks(toks, tx._T18_W, tx._T18_S)


def test_plan_no_shuffle_no_python(spark, sf_dir):
    """scan → codegen project → explode: the only exchange allowed is the
    presentation ORDER BY's range partitioning — no hash exchange, no
    Python in the row path."""
    df = QUERIES["t18_chunk_windows"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "hashpartitioning" not in plan, plan[:2000]

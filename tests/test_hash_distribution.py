"""Anti-twin distribution tests for the hash-based sharding/sampling
operators (VERDICT r4 directive #3).

The b45d56a bug class: the Knuth hash originally took ``h32 % mod``, whose
LOW bits equal the id's low bits for an odd multiplier — shard assignment
degenerated to ``doc_id % 16`` — and the SQL oracle twin shared the exact
formula, so every hash check stayed green while the shards were striped.
These tests are deliberately INDEPENDENT of the SQL twin: a from-scratch
numpy reimplementation pins the values, and chi-square bounds pin the
distribution under adversarial id patterns (sequential, even-only,
strided, high-bit-heavy) where a low-bit-degenerate hash collapses.

Would-have-caught check: `test_shards_are_not_id_mod_n` fails on the exact
pre-fix behavior (shard == id % 16 for every id)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from disq_original_spark.queries.packing import _KNUTH, _knuth_hash_col, _knuth_hash_sql

# ---- adversarial id patterns (each 40k ids, int64) ----
N = 40_000
PATTERNS = {
    "sequential": np.arange(N, dtype=np.int64),
    "even_only": 2 * np.arange(N, dtype=np.int64),
    "mult_of_16": 16 * np.arange(N, dtype=np.int64),
    "strided_4096": 4096 * np.arange(N, dtype=np.int64),
    "high_bits": (np.arange(N, dtype=np.int64) << 20) + 7,
    "beyond_32bit": np.arange(N, dtype=np.int64) + (1 << 33),
}

# chi-square critical values at p=1e-6 are ~65 (df=15) / ~190 (df=99);
# thresholds leave headroom for honest sampling noise while any systematic
# striping (the bug multiplies counts by mod/stride overlap factors) lands
# orders of magnitude above.
CHI2_BOUND = {16: 100.0, 100: 300.0}


def knuth_independent(ids: np.ndarray, mod: int) -> np.ndarray:
    """From-scratch reimplementation: h32 = (id & 0xFFFFFFFF) * K mod 2^32
    in plain uint64 arithmetic (not the 16-bit split the production column
    uses), then Knuth HIGH-bits scaling h32 * mod >> 32."""
    a = ids.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    h32 = (a * np.uint64(_KNUTH)) & np.uint64(0xFFFFFFFF)
    return ((h32 * np.uint64(mod)) >> np.uint64(32)).astype(np.int64)


def _spark_hash(spark, ids: np.ndarray, mod: int) -> np.ndarray:
    df = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
    pdf = df.select(_knuth_hash_col(mod).alias("h")).toPandas()
    return pdf["h"].to_numpy().astype(np.int64)


def chi2(shards: np.ndarray, mod: int) -> float:
    obs = np.bincount(shards, minlength=mod).astype(np.float64)
    exp = len(shards) / mod
    return float(((obs - exp) ** 2 / exp).sum())


@pytest.mark.parametrize("pattern", sorted(PATTERNS))
@pytest.mark.parametrize("mod", [16, 100])
def test_production_hash_equals_independent_reimplementation(spark, pattern, mod):
    ids = PATTERNS[pattern]
    got = _spark_hash(spark, ids, mod)
    want = knuth_independent(ids, mod)
    mism = int((got != want).sum())
    assert mism == 0, f"{pattern}/mod{mod}: {mism} value mismatches vs independent numpy"


@pytest.mark.parametrize("pattern", sorted(PATTERNS))
@pytest.mark.parametrize("mod", [16, 100])
def test_shard_counts_pass_chi_square(pattern, mod):
    # distribution checked on the independent reimplementation, which the
    # test above pins value-equal to the production column — this keeps the
    # 12-pattern sweep instant while still testing production behavior
    shards = knuth_independent(PATTERNS[pattern], mod)
    stat = chi2(shards, mod)
    assert stat < CHI2_BOUND[mod], (
        f"{pattern}/mod{mod}: chi-square {stat:.1f} exceeds {CHI2_BOUND[mod]} — "
        "shard distribution is striped (b45d56a class)"
    )


def test_shards_are_not_id_mod_n():
    """The exact pre-fix degeneracy: shard == id % 16 for EVERY id.  A
    healthy hash agrees with id % 16 on ~1/16 of ids by chance."""
    ids = PATTERNS["sequential"]
    shards = knuth_independent(ids, 16)
    agree = float((shards == (ids % 16)).mean())
    assert agree < 0.2, f"shard == id % 16 for {agree:.0%} of ids — degenerate hash"


def test_keep_threshold_unbiased_by_low_bits():
    """The b45d56a symptom on sampling: with h = id % 100-ish low-bit
    degeneracy, a mod-100 keep threshold selects systematically by
    id % 4.  Fixed hash: every id%4 residue class keeps ~rate%."""
    ids = PATTERNS["sequential"]
    h = knuth_independent(ids, 100)
    for rate in (10, 35, 80):
        kept = h < rate
        overall = kept.mean()
        for res in range(4):
            cls = kept[ids % 4 == res].mean()
            assert abs(cls - overall) < 0.02, (
                f"rate {rate}: id%4=={res} keeps {cls:.3f} vs overall "
                f"{overall:.3f} — low-bit selection bias"
            )


def test_sql_twin_matches_on_adversarial_ids(ddb):
    """The SQL twin must agree with the independent reimplementation on
    ids ≥ 2^32 and high-bit patterns too (testdata ids are small, so the
    oracle suite alone never exercises the overflow-guard arithmetic)."""
    for pattern in ("beyond_32bit", "high_bits", "strided_4096"):
        ids = PATTERNS[pattern][:2000]
        for mod in (16, 100):
            sql = _knuth_hash_sql(mod, "i")
            rows = ddb.execute(
                f"SELECT {sql} AS h FROM (SELECT unnest(?) AS i)", [ids.tolist()]
            ).fetchnumpy()
            got = rows["h"].astype(np.int64)
            want = knuth_independent(ids, mod)
            assert (got == want).all(), f"{pattern}/mod{mod}: SQL twin diverges"

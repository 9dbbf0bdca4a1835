"""Cache hygiene (VERDICT r4 directive #1): every ``.persist()`` a query
builder takes is registered with ``disq_original_spark.cache`` and released
by the harness once the build's results are drained — no persisted blocks
survive a build+drain+release cycle, so a long session (the driver's
139-query sweep, a bench run) never accumulates stale cached subtrees and
no query's timing is flattered by another query's resident cache."""

from __future__ import annotations

import pytest

from disq_original_spark.cache import release_persists, tracked_count, tracked_info
from disq_original_spark.queries import QUERIES

# Every query whose build path calls track_persist (directly or through
# operators): MinHash-LSH family, dupmark, interval-merge subtract, pHash,
# token features, the cached VCF decode.
PERSISTING = [
    "d04_ngram_jaccard",
    "d14_lsh_estimate_audit",
    "g07_typed_variant_stats",
    "g09_mark_duplicates",
    "g17_interval_subtract",
    "m04_phash_neardup",
    "p06_importance_resampling",
]


def _persistent_rdd_count(spark) -> int:
    # the authoritative storage view: JVM-side registry of persisted RDDs
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture(autouse=True)
def _clean_slate(spark, monkeypatch):
    # r13: corpus persists are scale-gated (cache.persist_if_material) and
    # the test SFs sit far below the default 256 MiB threshold — zero the
    # threshold so these tests keep exercising the persist machinery the
    # way a production-scale run would take it.
    monkeypatch.setenv("SPARK_GRAFT_SMALL_INPUT_BYTES", "0")
    release_persists()
    spark.catalog.clearCache()
    yield
    release_persists()
    spark.catalog.clearCache()


def test_scale_gated_persists_skip_small_corpus(spark, sf_dir, monkeypatch):
    """At the DEFAULT threshold a bench-scale corpus registers NO persists
    for the scale-gated sites: below the crossover the materialization
    barrier measurably dominates the recompute it saves (r13, d04
    2.53 s -> 1.49 s median).  The policy knob, not the persist machinery,
    is what changes with scale."""
    monkeypatch.delenv("SPARK_GRAFT_SMALL_INPUT_BYTES", raising=False)
    QUERIES["d04_ngram_jaccard"].build(spark, sf_dir)
    assert tracked_count() == 0
    release_persists()
    monkeypatch.setenv("SPARK_GRAFT_SMALL_INPUT_BYTES", "0")
    QUERIES["d04_ngram_jaccard"].build(spark, sf_dir)
    assert tracked_count() == 1  # threshold back at 0: persist registered


@pytest.mark.parametrize("name", PERSISTING)
def test_build_drain_release_leaves_no_cached_blocks(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    assert tracked_count() > 0, f"{name} expected to register persists"
    df.write.format("noop").mode("overwrite").save()  # drain
    released = release_persists()
    assert released > 0
    spark.catalog.clearCache()  # drop non-tracked .cache() blocks, if any
    assert _persistent_rdd_count(spark) == 0, (
        f"{name}: persisted RDDs survived build+drain+release"
    )


# The eager/lazy persist split is a MEASURED decision (SCALE.md "Selective
# eager persist": a persist dedupes sequential reuse only, so SLIM frames
# with CONCURRENT consumers materialize at build — d04 −16%, d14/d03 −8% —
# while FAT pipeline-fused caches stay lazy — eager cost g09 +0.3-1.0 s
# because the decode pass stopped fusing with its consumer).  Pin the
# policy per frame, in registration order, so a refactor can't silently
# flip a frame's eagerness (VERDICT r6 directive #2).
EAGER_POLICY = {
    "d04_ngram_jaccard": [True],  # capped postings index (counts + pairs)
    "d14_lsh_estimate_audit": [True, True, True],  # sig, pairs, shingle hashes
    "g09_mark_duplicates": [False],  # dupmark slim sig — decode pass must fuse
    "m04_phash_neardup": [False],  # pHash table — single-chain consumer
}


@pytest.mark.parametrize("name", sorted(EAGER_POLICY))
def test_persist_eagerness_policy(spark, sf_dir, name):
    QUERIES[name].build(spark, sf_dir)  # build only — no drain
    flags = [eager for _df, eager in tracked_info()]
    assert flags == EAGER_POLICY[name], (
        f"{name}: persist eagerness flipped — measured policy is "
        f"{EAGER_POLICY[name]}, build registered {flags}"
    )
    # behavior, not just the flag: an eager build has cached partitions
    # materialized BEFORE any drain; a fully-lazy build has none yet
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    cached = sum(i.numCachedPartitions() for i in infos)
    if any(EAGER_POLICY[name]):
        assert cached > 0, f"{name}: eager persist did not materialize at build"
    else:
        assert cached == 0, (
            f"{name}: lazy persist materialized {cached} partitions at build "
            "time — something is forcing the cache before the drain"
        )


def test_release_is_correctness_neutral(spark, sf_dir):
    """Unpersisting between build and drain must not change results — the
    subtree recomputes from lineage (this is why harness-level release
    can never corrupt a query, only cost recompute time)."""
    a = QUERIES["d04_ngram_jaccard"].build(spark, sf_dir)
    expected = sorted(map(tuple, a.collect()))
    release_persists()
    b = QUERIES["d04_ngram_jaccard"].build(spark, sf_dir)
    release_persists()  # release BEFORE the drain: persists never materialize
    got = sorted(map(tuple, b.collect()))
    assert got == expected


def test_entry_contract_releases_previous_build(spark):
    """__spark_entry__.queries() wrappers release the previous build's
    persists at each new build — the driver's sweep holds at most one
    query's persists at any time."""
    import __spark_entry__ as se

    qs = se.queries()
    qs["d04_ngram_jaccard"](spark, "/root/testdata/sf0.001")
    assert tracked_count() > 0
    qs["q02_filter"](spark, "/root/testdata/sf0.001")  # non-persisting build
    assert tracked_count() == 0


def test_no_bare_lineage_cut_in_query_paths():
    """VERDICT r13 #1: a bare ``lineage_cut`` (localCheckpoint) in a query
    path trades fault tolerance away at EVERY scale — on a real cluster,
    losing one executor after materialization makes the query
    unrecoverable (lineage is truncated).  Every query-path
    materialization point must route through ``cache.share_subtree`` so
    production-scale runs (above the small-input gate) get a recoverable
    tracked persist.  The one sanctioned direct ``localCheckpoint`` user
    is operators/graph.py's connected-components loop, where per-round
    lineage truncation is the algorithm's documented requirement (plan
    growth is exponential in rounds without it)."""
    import ast
    import pathlib

    import disq_original_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders: list[str] = []
    for sub in ("queries", "operators", "streaming"):
        for f in sorted((root / sub).glob("*.py")):
            tree = ast.parse(f.read_text())
            for node in ast.walk(tree):
                if isinstance(node, ast.Name) and node.id == "lineage_cut":
                    offenders.append(f"{sub}/{f.name}:{node.lineno} lineage_cut")
                if (
                    isinstance(node, ast.Attribute)
                    and node.attr == "localCheckpoint"
                    and f.name != "graph.py"
                ):
                    offenders.append(f"{sub}/{f.name}:{node.lineno} localCheckpoint")
    assert offenders == [], offenders


def test_release_frees_checkpoint_blocks(spark, sf_dir, monkeypatch):
    """Below the gate share_subtree lazily localCheckpoints; those blocks
    live OUTSIDE the SQL cache, so release_persists must free them
    explicitly (ADVICE r13) — a long sweep must not accumulate
    checkpointed RDDs until GC happens to run."""
    monkeypatch.delenv("SPARK_GRAFT_SMALL_INPUT_BYTES", raising=False)
    df = QUERIES["p01_sequence_packing"].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # materializes the lckpt
    assert _persistent_rdd_count(spark) > 0, "expected checkpoint blocks"
    release_persists()
    assert _persistent_rdd_count(spark) == 0, (
        "checkpointed RDD blocks survived release_persists"
    )

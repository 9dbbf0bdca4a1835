"""Multimodal plumbing: schemas, batch shapes, row expansion, determinism."""

from __future__ import annotations

from disq_original_spark.operators.multimodal import (
    FEATURE_DIM,
    documents_as_media,
    extract_features,
    sample_frames,
)
from disq_original_spark.tables import load_table


def test_media_schema(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint",
        "string",
        "binary",
        "map<string,string>",
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_shape_and_determinism(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["features_digest"]) == 32  # md5 hex of the feature vector
        assert r["n_bytes"] > 0
    # deterministic across runs and partitionings
    again = sorted(map(str, extract_features(media.repartition(7)).collect()))
    assert again == sorted(map(str, rows))
    # array form (library users / ANN feeds) keeps the raw vector
    arr_rows = extract_features(media, as_array=True).collect()
    by_id = {r["media_id"]: r for r in arr_rows}
    for r in arr_rows[:20]:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # digest is the md5 of the exact integer byte-moments — reproducible
    # from the payload alone (the property the SQL oracle relies on)
    import hashlib

    from disq_original_spark.operators.multimodal import _DECODERS

    media_rows = {r["media_id"]: r for r in media.collect()}
    for r in rows[:20]:
        mr = media_rows[r["media_id"]]
        # real container parse per kind -> pixel/sample bytes (the
        # operator's own kind->decoder table, so they cannot drift)
        _w, _h, p = _DECODERS[mr["kind"]](bytes(mr["data"]))
        moments = [
            (sum(p[j::FEATURE_DIM]), max(1, len(p[j::FEATURE_DIM])))
            for j in range(FEATURE_DIM)
        ]
        want = hashlib.md5(
            ",".join(f"{s}/{c}" for s, c in moments).encode()
        ).hexdigest()
        assert r["features_digest"] == want


def test_frame_sampling_expands_video_rows(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    n_video = media.filter("kind = 'video'").count()
    got = frames.collect()
    assert len(got) >= n_video  # ≥1 frame per video
    per_media = {}
    for r in got:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for frames_idx in per_media.values():
        assert sorted(frames_idx) == list(range(len(frames_idx)))  # dense 0..k
        assert len(frames_idx) <= 4


def test_bgzf_block_source_matches_golden(spark):
    from disq_original_spark.sources.bgzf_source import BgzfBlockSource

    df = BgzfBlockSource().blocks(
        spark, "/root/reference/src/test/resources/1.bam", split_size=128 * 1024
    )
    rows = sorted((r["pos"], r["c_size"], r["u_size"]) for r in df.collect())
    assert len(rows) == 26  # golden: 26 blocks in 1.bam
    assert rows[0] == (0, 14146, 65498)  # golden block 0
    # exactly-once under a different tiling
    df2 = BgzfBlockSource().blocks(
        spark, "/root/reference/src/test/resources/1.bam", split_size=40 * 1024
    )
    assert sorted((r["pos"], r["c_size"], r["u_size"]) for r in df2.collect()) == rows

"""Byte-level tests for the pure WAV / Y4M container codecs and the real
audio/video paths through the multimodal operators."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from disq_original_spark.operators.mediacontainers import (
    WAV_HEADER_SIZE,
    Y4M_FRAME_BYTES,
    wav_decode,
    wav_encode,
    wav_size,
    y4m_decode,
    y4m_encode,
    y4m_size,
)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4000))
def test_wav_round_trip_any_samples(samples):
    data = wav_encode(samples)
    assert len(data) == wav_size(len(samples))
    assert wav_decode(data) == samples


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4000))
def test_y4m_round_trip_any_content(content):
    data = y4m_encode(content)
    assert len(data) == y4m_size(len(content))
    frames = y4m_decode(data)
    assert b"".join(frames) == content
    # every frame except the last is a full plane; the last is the exact
    # content tail (trimmed back from zero padding)
    assert all(len(f) == Y4M_FRAME_BYTES for f in frames[:-1])
    assert len(frames) == max(1, -(-len(content) // Y4M_FRAME_BYTES))


def test_wav_decoder_walks_extra_riff_chunks():
    """Real WAV files often carry LIST/fact chunks between fmt and data;
    the chunk walk must skip them (with RIFF word alignment) and still
    find the samples."""
    samples = b"hello pcm world"
    base = wav_encode(samples)
    fmt_chunk = base[12:36]  # 'fmt ' + size + 16 bytes
    data_chunk = base[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    doctored = base[:12] + fmt_chunk + extra + data_chunk
    assert wav_decode(doctored) == samples


@pytest.mark.parametrize(
    "corrupt,match",
    [
        (lambda d: d[:20], "truncated"),
        (lambda d: b"RIFX" + d[4:], "not a WAV"),
        (lambda d: d[:20] + b"\x02" + d[21:], "unsupported WAV variant"),  # stereo
        (lambda d: d[:-6], "data truncated"),
        (lambda d: d[:12] + d[36:] + d[12:36], "data chunk before fmt"),
    ],
)
def test_corrupt_wav_fails_loud(corrupt, match):
    data = wav_encode(b"0123456789")
    with pytest.raises(ValueError, match=match):
        wav_decode(corrupt(data))


@pytest.mark.parametrize(
    "corrupt,match",
    [
        (lambda d: b"XUV4MPEG2" + d[9:], "not a Y4M"),
        (lambda d: d.replace(b"W16", b"W32"), "unsupported Y4M geometry"),
        (lambda d: d.replace(b"Cmono", b"C420m"), "unsupported Y4M colorspace"),
        (lambda d: d.replace(b"Xclen=", b"Xnope="), "missing a valid Xclen"),
        (lambda d: d.replace(b"FRAME\n", b"FRAMX\n", 1), "bad Y4M frame marker"),
        (lambda d: d[:-10], "plane truncated"),
    ],
)
def test_corrupt_y4m_fails_loud(corrupt, match):
    data = y4m_encode(b"z" * 400)
    with pytest.raises(ValueError, match=match):
        y4m_decode(corrupt(data))


def test_y4m_extra_x_extension_tokens_do_not_shadow_xclen():
    """YUV4MPEG2 allows any number of X<text> extension tokens; a stream
    carrying e.g. Xconverted-by=... either side of Xclen must still decode
    (ADVICE r5: a first-letter-keyed param dict let the LAST X token shadow
    Xclen and rejected conformant streams)."""
    content = b"q" * 400
    data = y4m_encode(content)
    before = data.replace(b" Xclen=", b" Xconverted-by=repo Xclen=")
    after = data.replace(b"\nFRAME", b" Xnote=trailing%20meta\nFRAME")
    both = before.replace(b"\nFRAME", b" Xz=9\nFRAME")
    for variant in (before, after, both):
        assert b"".join(y4m_decode(variant)) == content


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_container_garbage_never_escapes_valueerror(blob):
    for dec in (wav_decode, y4m_decode):
        try:
            dec(blob)
        except ValueError:
            pass


def test_media_payloads_are_real_containers(spark, sf_dir):
    """Every corpus payload parses with the matching real decoder and
    recovers exactly the document's UTF-8 bytes."""
    from disq_original_spark.operators.imagecodec import bmp_decode, to_gray
    from disq_original_spark.operators.multimodal import documents_as_media
    from disq_original_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in documents_as_media(docs).collect():
        if r["data"] is None:
            assert texts[r["media_id"]] is None
            continue
        payload, want = bytes(r["data"]), texts[r["media_id"]].encode("utf-8")
        if r["kind"] == "image":
            flat = to_gray(bmp_decode(payload)).reshape(-1)
            assert bytes(flat[: len(want)]) == want
            assert not flat[len(want):].any()
        elif r["kind"] == "audio":
            assert payload[:4] == b"RIFF" and wav_decode(payload) == want
        else:
            assert payload[:9] == b"YUV4MPEG2"
            assert b"".join(y4m_decode(payload)) == want


def test_sample_frames_match_text_slices(spark, sf_dir):
    """Decoded Y4M frames must be byte-equal to the 256-byte text slices
    the m03/m06 oracles compute in SQL."""
    from disq_original_spark.operators.multimodal import (
        documents_as_media,
        sample_frames,
    )
    from disq_original_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    texts = {r["doc_id"]: (r["text"] or "").encode("utf-8") for r in docs.collect()}
    got = sample_frames(documents_as_media(docs)).collect()
    assert got
    for r in got:
        t = texts[r["media_id"]]
        want = t[r["frame_idx"] * 256 : (r["frame_idx"] + 1) * 256]
        assert bytes(r["frame_data"]) == want
        assert r["n_bytes"] == len(want)


def test_y4m_xclen_mismatch_fails_loud():
    """A corrupted Xclen digit must raise, not silently return zero
    padding as content or skip the tail trim (round-5 review finding)."""
    data = y4m_encode(b"q" * 400)
    # cross-band corruption: frame-count check
    with pytest.raises(ValueError, match="inconsistent"):
        y4m_decode(data.replace(b"Xclen=400", b"Xclen=900"))
    with pytest.raises(ValueError, match="inconsistent"):
        y4m_decode(data.replace(b"Xclen=400", b"Xclen=100"))
    # SAME-band corruption downward (400 -> 300, both in frame 2): the
    # truncated tail is nonzero content, caught by the padding-zero guard
    with pytest.raises(ValueError, match="truncates nonzero"):
        y4m_decode(data.replace(b"Xclen=400", b"Xclen=300"))


def test_unknown_media_kind_fails_loud(spark):
    """extract_features on a kind outside image/audio/video must raise a
    clear ValueError, not an opaque KeyError mid-task."""
    from disq_original_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "text", b"abc", {})],
        "media_id long, kind string, data binary, meta map<string,string>",
    )
    with pytest.raises(Exception, match="unknown media kind 'text'"):
        extract_features(media).collect()

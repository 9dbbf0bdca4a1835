"""Pixel-level tests for the pure-numpy BMP codec and the real image path
through the multimodal operators (VERDICT r4 directive #5)."""

from __future__ import annotations

import numpy as np
import pytest

from disq_original_spark.operators.imagecodec import (
    HEADER_SIZE,
    bmp_decode,
    bmp_encode,
    bmp_size,
    resize_nearest,
    row_stride,
    to_gray,
)
from disq_original_spark.operators.multimodal import media_dims, text_to_bmp

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16), (17, 5), (79, 63), (2, 100)])
def test_rgb_round_trip_exact(w, h):
    img = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = bmp_encode(img)
    assert len(data) == bmp_size(w, h)
    back = bmp_decode(data)
    assert back.shape == (h, w, 3)
    assert (back == img).all()


@pytest.mark.parametrize("w,h", [(1, 1), (17, 5), (64, 33)])
def test_gray_round_trip_exact(w, h):
    gray = RNG.integers(0, 256, size=(h, w), dtype=np.uint8)
    back = bmp_decode(bmp_encode(gray))
    assert (back[:, :, 0] == gray).all()
    assert (to_gray(back) == gray).all()


def test_row_padding_math():
    # widths 1..8 cover every padding residue: stride = 3w rounded up to 4
    for w in range(1, 9):
        assert row_stride(w) == -(-3 * w // 4) * 4
        assert bmp_size(w, 2) == HEADER_SIZE + 2 * row_stride(w)


def test_top_down_bmp_decodes():
    """Negative header height = top-down row order (other encoders emit
    this); decode must handle it even though our encoder never writes it."""
    import struct

    img = RNG.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    data = bytearray(bmp_encode(img))
    # flip to top-down: negate height and reverse the stored row order
    struct.pack_into("<i", data, 22, -4)
    stride = row_stride(3)
    rows = [bytes(data[HEADER_SIZE + i * stride : HEADER_SIZE + (i + 1) * stride]) for i in range(4)]
    data[HEADER_SIZE:] = b"".join(reversed(rows))
    assert (bmp_decode(bytes(data)) == img).all()


@pytest.mark.parametrize(
    "corrupt,match",
    [
        (lambda d: d[:40], "truncated"),
        (lambda d: b"XX" + d[2:], "not a BMP"),
        (lambda d: d[:28] + b"\x08\x00" + d[30:], "unsupported BMP variant"),
        (lambda d: d[:-20], "truncated"),
    ],
)
def test_corrupt_bmp_fails_loud(corrupt, match):
    data = bmp_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match=match):
        bmp_decode(corrupt(data))


def test_resize_nearest_properties():
    img = RNG.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    up = resize_nearest(img, 16, 20)
    assert up.shape == (20, 16, 3)
    # identity resize is exact; every output pixel exists in the source
    assert (resize_nearest(img, 8, 10) == img).all()
    down = resize_nearest(img, 4, 5)
    # 2x downscale by index mapping picks every other pixel
    assert (down == img[::2, ::2]).all()


def test_text_to_bmp_pixels_are_text_bytes():
    """The corpus derivation is pixel-exact: decoding the BMP recovers the
    text's UTF-8 bytes row-major, zero-padded to the media_dims grid."""
    payload = b"The quick brown fox jumps over the lazy dog" * 3
    w, h = media_dims(len(payload))
    gray = to_gray(bmp_decode(text_to_bmp(payload)))
    assert gray.shape == (h, w)
    flat = gray.reshape(-1)
    assert bytes(flat[: len(payload)]) == payload
    assert (flat[len(payload) :] == 0).all()


def test_resize_operator_end_to_end(spark, sf_dir):
    """The resize operator (ex-resize_stub) replaces image payloads with
    genuinely resized BMPs and leaves audio/video rows untouched."""
    from disq_original_spark.operators.multimodal import documents_as_media, resize
    from disq_original_spark.tables import load_table

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(30))
    out = resize(media, 8, 8).collect()
    assert out
    originals = {r["media_id"]: r["data"] for r in media.collect()}
    n_images = 0
    for r in out:
        if r["kind"] != "image":
            assert r["data"] == originals[r["media_id"]]
            continue
        if r["data"] is None:
            continue
        n_images += 1
        img = bmp_decode(bytes(r["data"]))
        assert img.shape == (8, 8, 3)
        # resized pixels must be a nearest-neighbor subsample of the source
        src = bmp_decode(bytes(originals[r["media_id"]]))
        assert (img == resize_nearest(src, 8, 8)).all()
    assert n_images > 0

"""Property tests for the pure-numpy BMP codec: encode/decode round-trips
over arbitrary dimensions and pixel content, and decode robustness under
arbitrary corruption (must raise ValueError — never hang, never return
garbage silently, never raise anything scarier)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from disq_original_spark.operators.imagecodec import (
    bmp_decode,
    bmp_encode,
    bmp_size,
    resize_nearest,
)


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(1, 97),
    h=st.integers(1, 61),
    seed=st.integers(0, 2**32 - 1),
)
def test_round_trip_any_dims(w, h, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = bmp_encode(img)
    assert len(data) == bmp_size(w, h)
    assert (bmp_decode(data) == img).all()


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    cut=st.integers(0, 200),
    flips=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 255)), max_size=8
    ),
)
def test_corruption_never_escapes_valueerror(w, h, cut, flips):
    """Truncation + random byte flips: decode either succeeds (flip landed
    in pixel data or a don't-care header field) or raises ValueError."""
    data = bytearray(bmp_encode(np.zeros((h, w), dtype=np.uint8)))
    if cut:
        data = data[: max(0, len(data) - cut)]
    for pos, val in flips:
        if len(data):
            data[pos % len(data)] = val
    try:
        out = bmp_decode(bytes(data))
        # on success the output must be a well-formed pixel array
        assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
    except ValueError:
        pass  # the contract: fail loud with ValueError only


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_garbage_bytes_never_escape_valueerror(blob):
    try:
        bmp_decode(blob)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 30),
    ow=st.integers(1, 50),
    oh=st.integers(1, 50),
    seed=st.integers(0, 2**16),
)
def test_resize_pixels_come_from_source(w, h, ow, oh, seed):
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    out = resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow)
    # every output pixel is a source pixel at the floor-mapped index
    yi = (np.arange(oh) * h) // oh
    xi = (np.arange(ow) * w) // ow
    assert (out == img[yi][:, xi]).all()
    # resizing back to the original dims after upscale by an exact
    # multiple is the identity
    up = resize_nearest(img, w * 3, h * 2)
    assert (resize_nearest(up, w, h) == img).all()


def test_encode_rejects_bad_shapes():
    with pytest.raises(ValueError):
        bmp_encode(np.zeros((4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        resize_nearest(np.zeros((4, 4), dtype=np.uint8), 0, 5)

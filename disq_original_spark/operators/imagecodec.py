"""Dependency-free pure-numpy BMP codec + resize (VERDICT r4 directive #5).

The container has no image libraries (no PIL/opencv/ffmpeg), so the
multimodal pipeline previously ran on a documented fake decode.  BMP
(Windows V3, 24-bit uncompressed) is simple enough to implement exactly
from the public file-format spec in ~100 lines of numpy — which makes the
image path REAL end-to-end: ``documents_as_media`` emits genuine BMP
files, ``extract_features``/``perceptual_hash`` parse the headers and
recover the pixel grid, and ``resize`` is an actual pixel-space resample.

Format notes (the parts that bite):
- rows are stored BOTTOM-UP unless the header height is negative
  (top-down); both decode paths are supported, encode emits bottom-up;
- each row is padded to a 4-byte boundary;
- pixel order within a row is BGR, not RGB.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
HEADER_SIZE = _FILE_HEADER.size + _INFO_HEADER.size  # 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3 bytes/pixel padded up to a 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def bmp_size(width: int, height: int) -> int:
    """Exact encoded file size for a width x height 24-bit BMP."""
    return HEADER_SIZE + row_stride(width) * height


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode a (H, W) grayscale or (H, W, 3) RGB uint8 array as a 24-bit
    bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H,W) or (H,W,3) uint8 array, got {img.shape}")
    h, w, _ = img.shape
    stride = row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    data = rows.tobytes()
    file_size = HEADER_SIZE + len(data)
    return (
        _FILE_HEADER.pack(b"BM", file_size, 0, 0, HEADER_SIZE)
        + _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to a (H, W, 3) RGB uint8 array.
    Handles bottom-up (positive height) and top-down (negative height)
    layouts and row padding; fails loud on anything else."""
    if len(data) < HEADER_SIZE:
        raise ValueError(f"BMP truncated: {len(data)} bytes < {HEADER_SIZE}-byte header")
    magic, _fsize, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP: magic {magic!r}")
    hdr_size, w, h, planes, bpp, compression = _INFO_HEADER.unpack_from(
        data, _FILE_HEADER.size
    )[:6]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} "
            f"compression={compression} (only 24-bit uncompressed)"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = row_stride(w)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(f"BMP truncated: {len(data)} bytes < {need} expected")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def to_gray(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) -> (H, W) integer-exact gray: channel 0 when all channels
    are equal (our grayscale BMPs), else the integer mean (r+g+b)//3 —
    deterministic, no float weights."""
    img = np.asarray(img)
    if img.ndim == 2:
        return img
    if (img[:, :, 0] == img[:, :, 1]).all() and (img[:, :, 1] == img[:, :, 2]).all():
        return img[:, :, 0].copy()
    return (img.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample: source index = floor of the
    proportional position (the classic integer mapping, identical on every
    platform — no float rounding in the index math)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad target size {out_w}x{out_h}")
    img = np.asarray(img)
    h, w = img.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[yi][:, xi]

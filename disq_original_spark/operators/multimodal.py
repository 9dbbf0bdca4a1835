"""Multimodal (image/audio/video) column plumbing for a training-data
pipeline.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (``mapInPandas`` / pandas UDFs) so each Python worker touches a
whole batch of payloads at once.  The Spark-side machinery — schema, batch
shape, partition behavior, row-expansion (frame sampling) — is real and
tested.

ALL THREE MODALITY PATHS ARE REAL (round 5): payloads are genuine
container files produced by the repo's own pure-numpy codecs and parsed
back by real decoders —

- images: 24-bit BMP (``operators/imagecodec.py``); ``extract_features``
  and ``perceptual_hash`` parse the headers and recover the pixel grid,
  and ``resize`` is an actual pixel-space resample;
- audio: 8-bit mono PCM WAV (``operators/mediacontainers.py``);
  ``audio_frames`` walks the RIFF chunk list and windows the recovered
  samples;
- video: YUV4MPEG2 (Y4M) mono streams; ``sample_frames`` parses the
  stream header and FRAME markers and recovers the per-frame planes.

The synthetic corpus derivation (``documents_as_media``) stores each
document's UTF-8 bytes as the pixel grid / PCM samples / frame planes,
so the DuckDB oracles reproduce every pixel/sample statistic from the
text column in plain SQL while the Spark side exercises the full
encode -> bytes -> parse path.  (The content is synthetic; the
containers and parsers are not.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import BinaryType

from .imagecodec import bmp_decode, bmp_encode, resize_nearest, to_gray
from .mediacontainers import (
    Y4M_FRAME_BYTES,
    wav_decode,
    wav_encode,
    y4m_decode,
    y4m_encode,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, meta map<string,string>"
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "features_digest string"
)

FEATURES_ARRAY_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "features array<float>"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_data binary, n_bytes long"


def media_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic (width, height) for a synthetic image holding
    ``n_bytes`` of content — the corpus-derivation rule the SQL oracles
    mirror: width = 16 + n % 64, height = max(16, ceil(n / width)) so the
    pixel grid always holds the whole payload (the r4 fake-decode height
    formula could undersize the grid)."""
    w = 16 + n_bytes % 64
    return w, max(16, -(-n_bytes // w))


def text_to_bmp(payload: bytes) -> bytes:
    """Lay ``payload`` row-major into a :func:`media_dims` grayscale grid
    (zero-padded) and encode it as a real 24-bit BMP."""
    w, h = media_dims(len(payload))
    pixels = np.zeros(w * h, dtype=np.uint8)
    pixels[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    return bmp_encode(pixels.reshape(h, w))


@F.pandas_udf(BinaryType())
def bmp_from_text(texts: pd.Series) -> pd.Series:
    """Arrow-batched text -> real-BMP payload (used by the m04 builder,
    whose corpus is all images)."""
    return pd.Series(
        [None if t is None else text_to_bmp(t.encode("utf-8")) for t in texts],
        dtype=object,
    )


_ENCODERS = {
    "image": text_to_bmp,
    "audio": wav_encode,
    "video": y4m_encode,
}


def _codec_for(table: dict, kind: str):
    """Shared kind -> encoder/decoder lookup with the module's fail-loud
    contract (a raw KeyError mid-task is an opaque PythonException)."""
    try:
        return table[kind]
    except KeyError:
        raise ValueError(
            f"unknown media kind {kind!r}: expected one of {sorted(table)}"
        ) from None


@F.pandas_udf(BinaryType())
def _media_payload(kinds: pd.Series, texts: pd.Series) -> pd.Series:
    """Arrow-batched (kind, text) -> real container payload: BMP for
    images, 8-bit PCM WAV for audio, Y4M for video.  One UDF taking the
    kind column — NOT ``F.when(kind=='image', udf(...))`` — because Spark
    hoists a pandas UDF out of a conditional and evaluates it for EVERY
    row, so when-chaining three encoder UDFs would run all three on every
    row and discard two results."""
    return pd.Series(
        [
            None if t is None else _codec_for(_ENCODERS, k)(t.encode("utf-8"))
            for k, t in zip(kinds, texts)
        ],
        dtype=object,
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture: kind
    cycles image/audio/video, and every payload is a REAL container file
    (BMP pixel grid / WAV PCM samples / Y4M frame planes holding the
    text's UTF-8 bytes) built by an Arrow-batched pandas UDF."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        _media_payload(kind, F.col("text")).alias("data"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _stride_sums(seq: bytes, n_strides: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-stride (sum, count) over interleaved strides: stride
    j covers positions p with p % n_strides == j.  One bincount instead of
    n_strides Python byte-slices; float64 weights are exact for sums below
    2^53, far above any payload here."""
    arr = np.frombuffer(seq, dtype=np.uint8)
    idx = np.arange(arr.size, dtype=np.int64) % n_strides
    sums = np.bincount(idx, weights=arr, minlength=n_strides).astype(np.int64)
    counts = np.bincount(idx, minlength=n_strides).astype(np.int64)
    return sums, counts


def _moments(seq: bytes) -> tuple[list[float], list[tuple[int, int]]]:
    """Per-stride integer moments over a sample/pixel sequence.  The digest
    fingerprint is defined over THESE exact integers (not the float
    features) so an independent engine (the DuckDB oracle) reproduces it
    without float-formatting/rounding parity games."""
    sums, counts = _stride_sums(seq, FEATURE_DIM)
    feats = []
    moments = []
    for s, c in zip(sums.tolist(), counts.tolist()):
        c = max(1, c)
        moments.append((s, c))
        feats.append(round(s / (255.0 * c), 6))
    return feats, moments


def _decode_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """REAL image decode: parse the BMP, recover the grayscale pixel grid,
    return (width, height, row-major pixel bytes)."""
    img = bmp_decode(payload)
    gray = to_gray(img)
    return img.shape[1], img.shape[0], gray.tobytes()


def _decode_samples(payload: bytes) -> tuple[int, int, bytes]:
    """REAL audio decode: walk the WAV RIFF chunks, recover the PCM
    samples; width/height are synthetic-grid metadata from the sample
    count (the media_dims-style derivation the oracles mirror)."""
    samples = wav_decode(payload)
    n = len(samples)
    return 16 + n % 64, 16 + (n // 64) % 64, samples


def _decode_frames_concat(payload: bytes) -> tuple[int, int, bytes]:
    """REAL video decode: parse the Y4M stream and concatenate the
    content-trimmed frame planes back into the sample sequence."""
    content = b"".join(y4m_decode(payload))
    n = len(content)
    return 16 + n % 64, 16 + (n // 64) % 64, content


_DECODERS = {
    "image": _decode_pixels,
    "audio": _decode_samples,
    "video": _decode_frames_concat,
}


def extract_features(media: DataFrame, as_array: bool = False) -> DataFrame:
    """Arrow-batched feature extraction: one pandas batch in, one out.
    At cluster scale, batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch — payload bytes stream
    through Arrow, never through the driver.

    Default output carries ``features_digest`` — md5 over the exact integer
    byte-moments (``sum/count`` per stride) the features derive from — a
    scalar fingerprint that downstream exact-dedup / verification passes
    (and the driver's row canonicalizer) can sort, hash, and reproduce in
    plain SQL.  ``as_array=True`` keeps the raw ``array<float>`` column for
    library users feeding an ANN index.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if data is None:
                    continue  # NULL payload: skip, as the sibling text passes do
                payload = bytes(data)
                # every kind is a REAL container parse: BMP -> pixel
                # grid, WAV -> PCM samples, Y4M -> frame planes
                w, h, seq = _codec_for(_DECODERS, kind)(payload)
                feats, moments = _moments(seq)
                if as_array:
                    rows.append((mid, kind, len(payload), w, h, feats))
                else:
                    digest = hashlib.md5(
                        ",".join(f"{s}/{c}" for s, c in moments).encode()
                    ).hexdigest()
                    rows.append((mid, kind, len(payload), w, h, digest))
            cols = ["media_id", "kind", "n_bytes", "width", "height"]
            cols.append("features" if as_array else "features_digest")
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, FEATURES_ARRAY_SCHEMA if as_array else FEATURES_SCHEMA)


def sample_frames(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows — one input row expands to ≤
    max_frames rows (the mapInPandas row-expansion shape a real ffmpeg
    sampler uses).  REAL parse: each payload is a Y4M stream; the decoder
    validates the stream header and FRAME markers and trims the final
    plane back to the content length, so emitted frames carry exactly the
    content bytes.  Frame size is fixed by the container geometry
    (``Y4M_FRAME_BYTES`` of content per plane), not a tunable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "video" or data is None:
                    continue
                frames = y4m_decode(bytes(data))
                clen = (len(frames) - 1) * Y4M_FRAME_BYTES + len(frames[-1])
                # sampling policy (unchanged from the raw-bytes era): up to
                # max_frames FULL planes; a lone short plane only when the
                # whole clip is shorter than one plane
                n_emit = min(max_frames, max(1, clen // Y4M_FRAME_BYTES))
                for i in range(min(n_emit, len(frames))):
                    out.append((mid, i, frames[i], len(frames[i])))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_data", "n_bytes"]
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


AUDIO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, n_bytes long, energy long, peak int"
)


def audio_frames(
    media: DataFrame, frame_len: int = 512, hop: int = 256, max_frames: int = 8
) -> DataFrame:
    """Overlapping audio frame windowing (the librosa ``frame`` shape): each
    audio payload yields frames starting every ``hop`` bytes, ``frame_len``
    bytes long (the tail frame may be short), capped at ``max_frames``.
    Per frame the operator emits integer-exact signal statistics — energy =
    Σ sample² and peak = max sample over the byte-decoded samples — so an
    independent engine reproduces every value without float parity games.

    Arrow-batched mapInPandas with numpy windowing per payload; one input
    row expands to ≤ max_frames slim rows (40 bytes each), so the Python
    boundary carries frame STATISTICS, never frame payloads.  REAL parse:
    each payload is an 8-bit mono PCM WAV; the decoder walks the RIFF
    chunk list, validates the fmt chunk and recovers the sample bytes.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "audio" or data is None:
                    continue
                pcm = wav_decode(bytes(data))
                if len(pcm) == 0:
                    continue  # empty clips carry no frames (as before)
                samples = np.frombuffer(pcm, dtype=np.uint8)
                n = len(samples)
                i = 0
                while i * hop < n and i < max_frames:
                    seg = samples[i * hop : i * hop + frame_len].astype(np.int64)
                    out.append(
                        (mid, i, len(seg), int((seg * seg).sum()), int(seg.max()))
                    )
                    i += 1
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "n_bytes", "energy", "peak"]
            )

    return media.mapInPandas(run, AUDIO_FRAMES_SCHEMA)


def resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize (schema in = schema out, data column replaced):
    image payloads decode through the pure-numpy BMP codec, resample with
    deterministic nearest-neighbor index mapping, and re-encode; non-image
    rows pass through untouched.  Arrow-batched pandas UDF over (kind,
    data) only — media_id/meta never cross the Python boundary."""

    @F.pandas_udf(BinaryType())
    def _resize(kinds: pd.Series, datas: pd.Series) -> pd.Series:
        out = []
        for kind, data in zip(kinds, datas):
            if kind != "image" or data is None:
                out.append(data)
                continue
            img = bmp_decode(bytes(data))
            out.append(bmp_encode(resize_nearest(img, width, height)))
        return pd.Series(out, dtype=object)

    return media.withColumn("data", _resize("kind", "data"))


PHASH_BANDS = 4
PHASH_BITS = 64  # 4 bands x 16 bits
PHASH_SCHEMA = "media_id long, " + ", ".join(f"b{b} int" for b in range(PHASH_BANDS))


def _ahash_bands(payload: bytes) -> list[int]:
    """The aHash core shared by :func:`perceptual_hash` and
    :func:`frame_hashes`: 64 interleaved strides, integer cross-multiply
    bit rule (``s_j * C > S * c_j``, no float division), packed into
    ``PHASH_BANDS`` 16-bit band ints.  One vectorized bincount pass
    (``_stride_sums``) instead of 64 Python byte-slices."""
    # int64 bit-rule bound: s_j*C <= 255*n^2 must stay under 2^63, i.e.
    # n < ~1.9e8 bytes.  Beyond that numpy would wrap silently where the
    # old pure-Python ints were exact — fail loud instead (a 190 MB single
    # image does not belong in one aHash call).
    if len(payload) >= 190_000_000:
        raise ValueError(
            f"payload of {len(payload)} bytes exceeds the exact-int64 "
            "aHash bound (~1.9e8); hash a downscaled rendition instead"
        )
    sums, counts = _stride_sums(payload, PHASH_BITS)
    S = int(sums.sum())
    C = int(counts.sum())
    bits = (sums * C) > (S * counts)  # int64-exact under the bound above
    weights = 1 << np.arange(16, dtype=np.int64)
    return [
        int((bits[16 * b : 16 * (b + 1)] * weights).sum())
        for b in range(PHASH_BANDS)
    ]



def perceptual_hash(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image row, Arrow-batched, over the
    REAL decode: each payload is parsed as a BMP and the grayscale pixel
    grid (row-major) is split into 64 interleaved strides; bit j is set iff
    stride j's mean pixel exceeds the whole-image mean.  The comparison is
    the exact integer cross-multiply ``s_j * C > S * c_j`` — no float
    division — so an independent engine reproduces every bit.  The hash is
    emitted as ``PHASH_BANDS`` 16-bit band integers (not one int64): the
    bands ARE the LSH keys downstream, and 16-bit ints never meet sign-bit
    trouble.

    All-zero images (no signal — e.g. an empty document's padded grid)
    would all collide on the all-zero hash and flood the pair output with
    meaningless exact dups, so they are dropped like NULLs (the oracle
    mirrors with a ``length(text) > 0`` guard).

    Near-dup guarantee: two hashes within Hamming distance ``PHASH_BANDS-1``
    share at least one identical band (pigeonhole), so a band-equality join
    finds ALL such pairs — the standard image-dedup recall argument.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None or len(data) == 0:
                    continue
                _w, _h, seq = _decode_pixels(bytes(data))
                if not any(seq):
                    continue  # all-zero grid: no signal (see docstring)
                rows.append((mid, *_ahash_bands(seq)))
            yield pd.DataFrame(
                rows, columns=["media_id"] + [f"b{b}" for b in range(PHASH_BANDS)]
            )

    return media.mapInPandas(run, PHASH_SCHEMA)


def frame_hashes(frames: DataFrame) -> DataFrame:
    """64-bit aHash per (media_id, frame_idx) — the per-frame twin of
    :func:`perceptual_hash`, same integer cross-multiply bit rule, Arrow-
    batched; only 6 ints per frame cross back to the JVM."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, fi, data in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["frame_data"]
            ):
                if data is None or len(data) == 0:
                    continue
                rows.append((mid, fi, *_ahash_bands(bytes(data))))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx"] + [f"b{b}" for b in range(PHASH_BANDS)],
            )

    return frames.mapInPandas(
        run, "media_id long, frame_idx int, " + ", ".join(f"b{b} int" for b in range(PHASH_BANDS))
    )

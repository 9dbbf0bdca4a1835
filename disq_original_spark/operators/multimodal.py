"""Multimodal (image/audio/video) column plumbing for a training-data
pipeline.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators (``mapInPandas``) so each Python worker touches a whole batch of
payloads at once.  The Spark-side machinery — schema, batch shape, partition
behavior, row-expansion (frame sampling) — is real and tested.

DECODE IS A DETERMINISTIC FAKE: the container has no image/audio codecs
(no PIL/ffmpeg), so ``_fake_decode`` derives pseudo pixel/sample statistics
from the payload bytes (documented, seeded by content).  Swapping in a real
decoder is a one-function change; every schema and plan stays identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    payload = UTF-8 bytes of the text, kind cycles image/audio/video."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float], list[tuple[int, int]]]:
    """Deterministic stand-in for an image decode: width/height from payload
    length, 'features' = normalized byte-histogram moments.  Replace with
    PIL/librosa/ffmpeg in a full environment.

    Also returns the raw integer moments ``(byte_sum, count)`` per stride —
    the digest fingerprint is defined over THESE exact integers (not the
    float features) so an independent engine (the DuckDB oracle) reproduces
    it without float-formatting/rounding parity games."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    feats = []
    moments = []
    for j in range(FEATURE_DIM):
        sl = payload[j::FEATURE_DIM]
        moments.append((sum(sl), max(1, len(sl))))
        feats.append(round(sum(sl) / (255.0 * max(1, len(sl))), 6))
    return width, height, feats, moments


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
                w, h, feats, moments = _fake_decode(payload)
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


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one input row expands to ≤ max_frames
    rows (the mapInPandas row-expansion shape a real ffmpeg sampler uses)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "video" or data is None:
                    continue
                payload = bytes(data)
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    frame = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out.append((mid, i, frame, len(frame)))
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
    boundary carries frame STATISTICS, never frame payloads.  Swap
    ``_fake_decode``-style byte samples for real PCM via soundfile/librosa
    in a full environment — the schema and batch shape stay identical.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "audio" or data is None or len(data) == 0:
                    continue
                samples = np.frombuffer(bytes(data), dtype=np.uint8)
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


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize placeholder: raises until a real image library is present —
    the contract (schema in = schema out, data column replaced) is fixed."""
    raise NotImplementedError(
        "resize requires an image codec (PIL/opencv) not present in this "
        "environment; extract_features/sample_frames demonstrate the "
        "identical mapInPandas plumbing with a deterministic fake decode"
    )


PHASH_BANDS = 4
PHASH_BITS = 64  # 4 bands x 16 bits
PHASH_SCHEMA = "media_id long, " + ", ".join(f"b{b} int" for b in range(PHASH_BANDS))


def _ahash_bands(payload: bytes) -> list[int]:
    """The aHash core shared by :func:`perceptual_hash` and
    :func:`frame_hashes`: 64 interleaved strides, integer cross-multiply
    bit rule (``s_j * C > S * c_j``, no float division), packed into
    ``PHASH_BANDS`` 16-bit band ints.  Each stride is materialized once."""
    moms = []
    for j in range(PHASH_BITS):
        stride = payload[j::PHASH_BITS]
        moms.append((sum(stride), len(stride)))
    S = sum(s for s, _ in moms)
    C = sum(c for _, c in moms)
    bits = [1 if s * C > S * c else 0 for s, c in moms]
    return [
        sum(bits[16 * b + k] << k for k in range(16)) for b in range(PHASH_BANDS)
    ]



def perceptual_hash(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per media row, Arrow-batched.

    The decoded payload is split into 64 interleaved strides (the fake
    decode's pixel grid); bit j is set iff stride j's mean byte exceeds the
    whole-payload mean.  The comparison is the exact integer cross-multiply
    ``s_j * C > S * c_j`` — no float division — so an independent engine
    reproduces every bit.  The hash is emitted as ``PHASH_BANDS`` 16-bit
    band integers (not one int64): the bands ARE the LSH keys downstream,
    and 16-bit ints never meet sign-bit trouble.

    Near-dup guarantee: two hashes within Hamming distance ``PHASH_BANDS-1``
    share at least one identical band (pigeonhole), so a band-equality join
    finds ALL such pairs — the standard image-dedup recall argument.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None or len(data) == 0:
                    # empty payloads carry no signal and would all collide
                    # on the all-zero hash, flooding the pair output with
                    # meaningless exact dups; dropped like NULLs (and like
                    # the oracle, whose generate_series over an empty text
                    # emits no rows)
                    continue
                rows.append((mid, *_ahash_bands(bytes(data))))
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

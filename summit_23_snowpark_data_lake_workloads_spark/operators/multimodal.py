"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the
pixel-level DECODE step is stubbed two ways (explicit, per the build
contract):
- ``decoder="strict"``  -> NotImplementedError (the production slot where
  Pillow/torchaudio/pyav plugs in);
- ``decoder="fake"``    -> deterministic md5-derived pseudo-features, so
  the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
  batch shape — is real and testable end-to-end.

The METADATA tier is NOT stubbed: :func:`probe_media_headers`
(``decoder="headers"``) parses PNG / JPEG / GIF containers with the
stdlib alone — width, height, channels straight from the magic bytes
(PNG IHDR chunk; JPEG SOFn segment; GIF logical screen descriptor) —
the ffprobe-style probe pass a training pipeline runs over every object
before deciding what to decode for real.

Scale notes: ``mapInPandas`` streams Arrow batches through the Python
worker — memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of file sizes; repartition before decode to use every core
(the same manual scale-out the reference applies to its PDF stage, R9).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal row schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_features(content: bytes) -> list[float]:
    """Deterministic pseudo-embedding: md5 bytes -> FEATURE_DIM floats in
    [-1, 1]. A STUB standing in for a real encoder."""
    digest = hashlib.md5(content).digest()
    return [(b - 128) / 128.0 for b in digest[:FEATURE_DIM]]


def extract_media_features(
    media: DataFrame, decoder: str = "fake", num_partitions: int | None = None
) -> DataFrame:
    """binary media rows -> (media_id, media_type, n_bytes, features).

    Real Arrow plumbing, stubbed pixel decode (see module docstring).
    ``decoder="headers"`` routes to the real stdlib metadata tier
    (:func:`probe_media_headers` — note its different output schema).
    The ``mapInPandas`` generator yields one output frame per input
    Arrow batch — constant memory however large the table is.
    """
    if decoder == "headers":
        return probe_media_headers(media, num_partitions)
    if decoder not in ("fake", "strict"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "real media decode requires Pillow/pyav; install and plug in here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(_fake_features),
                }
            )

    df = media
    if num_partitions:
        df = df.repartition(num_partitions)
    return df.mapInPandas(decode_batches, FEATURES_SCHEMA)


HEADERS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),  # png|jpeg|gif|NULL
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)

#: PNG color type -> sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOF markers carrying frame dimensions — every C0-CF except the
#: non-frame markers C4 (DHT), C8 (JPG ext) and CC (DAC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def parse_image_header(data: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) from container magic bytes, or
    None when the payload is not a recognized image. Pure stdlib — byte
    slicing only, no codec; never raises on malformed input."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        width = int.from_bytes(data[16:20], "big")
        height = int.from_bytes(data[20:24], "big")
        channels = _PNG_CHANNELS.get(data[25], 0) if len(data) > 25 else 0
        if width and height and channels:
            return ("png", width, height, channels)
        return None
    if data[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to SOFn
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                return None  # desynced — not a well-formed segment stream
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # parameterless markers
                continue
            seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                seg = data[i + 4 : i + 2 + seg_len]
                if len(seg) < 6:
                    return None
                height = int.from_bytes(seg[1:3], "big")
                width = int.from_bytes(seg[3:5], "big")
                channels = seg[5]
                if width and height and channels:
                    return ("jpeg", width, height, channels)
                return None
            i += 2 + seg_len
        return None
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        width = int.from_bytes(data[6:8], "little")
        height = int.from_bytes(data[8:10], "little")
        if width and height:
            return ("gif", width, height, 3)  # palette RGB
        return None
    return None


def probe_media_headers(
    media: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """The metadata decode tier (``decoder="headers"``): per payload,
    container format + dimensions + channels parsed from magic bytes.
    Unrecognized/corrupt payloads yield NULL format (kept, not dropped —
    the probe's job is to classify everything, filtering is the caller's
    query). Same bounded-memory ``mapInPandas`` shape as the feature
    path."""

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    df = media
    if num_partitions:
        df = df.repartition(num_partitions)
    return df.mapInPandas(probe_batches, HEADERS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    with the parent payload reference. The frame decode itself is the
    stubbed step; the explode/bookkeeping — the part Spark owns — is real.

    Frame count is estimated from metadata (``meta['n_frames']``), the way
    a production pipeline would carry probe results alongside the payload.
    Videos with missing, non-numeric, or zero ``n_frames`` produce NO
    sample rows (a frame_idx-0 row for a frameless payload would be a
    phantom frame).
    """
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", n_frames.alias("_nf"))
        .filter(F.col("_nf") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("_nf") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )

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
(``decoder="headers"``) parses PNG / JPEG / GIF / WAV / MP4 containers
with the stdlib alone — width, height, channels, sample rate straight
from the magic bytes (PNG IHDR chunk; JPEG SOFn segment; GIF logical
screen descriptor; RIFF ``fmt `` chunk; ISO-BMFF ``moov/trak/tkhd``
walk) — the ffprobe-style probe pass a training pipeline runs over
every object before deciding what to decode for real.

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

    # explicit projection before the opaque Python node (guide §4.1):
    # Spark cannot see which columns the function touches, so a wider
    # caller frame (e.g. a probe `meta` column) would otherwise ship —
    # and be read from storage — for nothing.
    df = media.select("media_id", "media_type", "content")
    if num_partitions:
        df = df.repartition(num_partitions)
    return df.mapInPandas(decode_batches, FEATURES_SCHEMA)


HEADERS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),  # png|jpeg|gif|wav|mp4|NULL
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio only
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


def parse_audio_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, channels, sample_rate) for RIFF/WAVE payloads, or None.
    Walks RIFF chunks to ``fmt `` (WAV spec: channels @ offset 2,
    sample rate @ offset 4 of the chunk body). Stdlib byte slicing only;
    never raises on malformed input."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    while i + 8 <= len(data):
        chunk_id = data[i : i + 4]
        chunk_len = int.from_bytes(data[i + 4 : i + 8], "little")
        if chunk_id == b"fmt " and i + 8 + 8 <= len(data):
            body = data[i + 8 : i + 8 + chunk_len]
            if len(body) < 8:
                return None
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            if channels and sample_rate:
                return ("wav", channels, sample_rate)
            return None
        # chunks are word-aligned: odd lengths carry one pad byte
        i += 8 + chunk_len + (chunk_len % 2)
    return None


def parse_video_header(data: bytes) -> tuple[str, int | None, int | None] | None:
    """(format, width, height) for ISO-BMFF (MP4) payloads, or None.
    The ``ftyp`` box at offset 0 identifies the container; a bounded
    box walk into ``moov``/``trak``/``tkhd`` recovers the track's
    presentation size (16.16 fixed point, last 8 bytes of tkhd).
    Dimensions are None when no tkhd is found — format identification
    alone is still useful to the probe pass.

    Handles the spec's full size encodings (ISO 14496-12 §4.2):
    ``size==1`` reads the 64-bit largesize that follows the type, and
    ``size==0`` means the box extends to the end of its enclosing
    bound. A corrupt size stops the scan of THAT level only (the next
    offset is unknowable), and a tkhd without usable dimensions lets
    the walk continue to later sibling tracks instead of aborting."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, path: tuple) -> tuple | None:
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(data[i : i + 4], "big")
            btype = data[i + 4 : i + 8]
            body_off = i + 8
            if size == 1:  # 64-bit largesize follows the type
                if i + 16 > hi:
                    break
                size = int.from_bytes(data[i + 8 : i + 16], "big")
                body_off = i + 16
                if size < 16:
                    break
            elif size == 0:  # box extends to the end of the bound
                size = hi - i
            elif size < 8:
                break  # corrupt: next offset unknowable — stop this level
            if i + size > hi:
                break
            if path and btype == path[0]:
                if len(path) == 1:  # tkhd reached
                    body = data[body_off : i + size]
                    if len(body) >= 8:
                        w = int.from_bytes(body[-8:-4], "big") >> 16
                        h = int.from_bytes(body[-4:], "big") >> 16
                        if w and h:
                            return (w, h)
                    # dimension-less track (e.g. audio): keep scanning
                else:
                    found = walk(body_off, i + size, path[1:])
                    if found:
                        return found
            i += size
        return None

    dims = walk(0, len(data), (b"moov", b"trak", b"tkhd"))
    return ("mp4", dims[0] if dims else None, dims[1] if dims else None)


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _box_largesize(btype: bytes, body: bytes) -> bytes:
    """ISO-BMFF box using the ``size==1`` + 64-bit largesize encoding."""
    return (
        (1).to_bytes(4, "big")
        + btype
        + (16 + len(body)).to_bytes(8, "big")
        + body
    )


def _tkhd(width: int, height: int) -> bytes:
    return _box(
        b"tkhd",
        b"\x00" * 76
        + (width << 16).to_bytes(4, "big")
        + (height << 16).to_bytes(4, "big"),
    )


def demo_media_payloads() -> list[tuple[int, str, bytes]]:
    """Deterministic in-plan media fixtures, one per container format
    the probe tier parses (plus a largesize MP4 and a garbage payload).
    Byte-level constants so the driver's differential gate can oracle
    :func:`probe_media_headers` against spec-derived expected values
    (`media_probe_headers` in plans/queries_ml.py) — no binary testdata
    column required."""
    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + (17).to_bytes(4, "big")  # width
        + (23).to_bytes(4, "big")  # height
        + bytes([8, 6, 0, 0, 0])  # bit depth 8, color type 6 (RGBA)
        + b"\x00\x00\x00\x00"  # placeholder crc (not parsed)
    )
    jpeg = (
        b"\xff\xd8"  # SOI
        + b"\xff\xc0"  # SOF0
        + (17).to_bytes(2, "big")  # segment length
        + b"\x08"  # precision
        + (480).to_bytes(2, "big")  # height
        + (640).to_bytes(2, "big")  # width
        + b"\x03"  # 3 components
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    gif = (
        b"GIF89a"
        + (320).to_bytes(2, "little")
        + (200).to_bytes(2, "little")
        + b"\xf7\x00\x00"
    )
    fmt_body = (
        (1).to_bytes(2, "little")  # PCM
        + (2).to_bytes(2, "little")  # channels
        + (44100).to_bytes(4, "little")  # sample rate
        + (176400).to_bytes(4, "little")  # byte rate
        + (4).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits/sample
    )
    wav_chunks = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt_body
    wav = b"RIFF" + len(wav_chunks).to_bytes(4, "little") + wav_chunks
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mp4 = ftyp + _box(b"moov", _box(b"trak", _tkhd(640, 360)))
    # same container, moov carried in the 64-bit largesize encoding,
    # behind a dimension-less (audio) first track — exercises the
    # size==1 path and the keep-scanning-siblings path
    mp4_large = ftyp + _box_largesize(
        b"moov",
        _box(b"trak", _box(b"tkhd", b"\x00" * 84)) + _box(b"trak", _tkhd(1920, 1080)),
    )
    garbage = bytes(range(32))
    return [
        (1, "image", png),
        (2, "image", jpeg),
        (3, "image", gif),
        (4, "audio", wav),
        (5, "video", mp4),
        (6, "video", mp4_large),
        (7, "image", garbage),
    ]


def probe_media_headers(
    media: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """The metadata decode tier (``decoder="headers"``): per payload,
    container format + dimensions + channels parsed from magic bytes.
    Unrecognized/corrupt payloads yield NULL format (kept, not dropped —
    the probe's job is to classify everything, filtering is the caller's
    query). Same bounded-memory ``mapInPandas`` shape as the feature
    path."""

    def _probe_one(c: bytes) -> tuple:
        """(format, width, height, channels, sample_rate) across the
        image/audio/video parsers; all-None when unrecognized."""
        img = parse_image_header(c)
        if img:
            return (img[0], img[1], img[2], img[3], None)
        aud = parse_audio_header(c)
        if aud:
            return (aud[0], None, None, aud[1], aud[2])
        vid = parse_video_header(c)
        if vid:
            return (vid[0], vid[1], vid[2], None, None)
        return (None, None, None, None, None)

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_probe_one(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "channels": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[4] for p in parsed], dtype="Int32"),
                }
            )

    # column-prune before the opaque Python node (guide §4.1) — the
    # probe reads exactly these three
    df = media.select("media_id", "media_type", "content")
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

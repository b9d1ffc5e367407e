"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (no PIL/ffmpeg), so the DECODE
step is stubbed two ways (explicit, per the build contract):
- ``decoder="strict"``  -> NotImplementedError (the production slot where
  Pillow/torchaudio/pyav plugs in);
- ``decoder="fake"``    -> deterministic md5-derived pseudo-features, so
  the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
  batch shape — is real and testable end-to-end.

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

    Real Arrow plumbing, stubbed decode (see module docstring). The
    ``mapInPandas`` generator yields one output frame per input Arrow
    batch — constant memory however large the table is.
    """
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

"""Multimodal plumbing tests: schema, Arrow batch flow, deterministic stub
features, frame-sampling plan."""

from __future__ import annotations

import pytest

from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    _fake_features,
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG fake bytes 0" * 10, {"width": "64", "height": "64"}),
        (1, "image", b"\x89PNG fake bytes 1" * 99, {"width": "8", "height": "8"}),
        (2, "audio", b"RIFF fake wav" * 5, {"sample_rate": "16000"}),
        (3, "video", b"\x00\x00ftyp fake mp4" * 7, {"n_frames": "25"}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_plumbing(media):
    out = {r.media_id: r for r in extract_media_features(media, decoder="fake").collect()}
    assert len(out) == 4
    for mid, r in out.items():
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes > 0
    # deterministic: same bytes -> same features, distinct bytes -> distinct
    assert out[0].features != out[1].features
    row = media.where("media_id = 0").first()
    assert out[0].features == pytest.approx(_fake_features(bytes(row.content)))


def test_strict_decoder_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_media_features(media, decoder="strict").collect()


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_n=10).collect()
    assert {(r.media_id, r.frame_idx) for r in frames} == {(3, 0), (3, 10), (3, 20)}

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


# ---------------------------------------------------------------------------
# Header-probe tier (VERDICT r2 #10): real stdlib decode of PNG/JPEG/GIF
# container metadata — the one decode step that needs no codec library.
# ---------------------------------------------------------------------------

from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (  # noqa: E402
    parse_image_header,
    probe_media_headers,
)

from . import fixtures as FX  # noqa: E402


def test_parse_image_header_pure():
    assert parse_image_header(FX.make_png(64, 48, color_type=2)) == ("png", 64, 48, 3)
    assert parse_image_header(FX.make_png(7, 9, color_type=6)) == ("png", 7, 9, 4)
    assert parse_image_header(FX.make_jpeg(320, 200, channels=3)) == (
        "jpeg", 320, 200, 3,
    )
    assert parse_image_header(FX.make_jpeg(16, 16, channels=1)) == ("jpeg", 16, 16, 1)
    assert parse_image_header(FX.make_gif(12, 34)) == ("gif", 12, 34, 3)
    # malformed inputs classify as None, never raise
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\nXXXX") is None
    assert parse_image_header(b"\xff\xd8\x00garbage") is None
    assert parse_image_header(FX.make_jpeg(320, 200)[:6]) is None
    assert parse_image_header(b"RIFF not an image") is None


def test_probe_media_headers_spark(spark):
    rows = [
        (0, "image", FX.make_png(64, 48), {}),
        (1, "image", FX.make_jpeg(320, 200), {}),
        (2, "image", FX.make_gif(12, 34), {}),
        (3, "image", b"corrupt not an image", {}),
        (4, "audio", b"RIFF fake wav", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in probe_media_headers(media).collect()}
    assert len(out) == 5
    assert (out[0].format, out[0].width, out[0].height, out[0].channels) == (
        "png", 64, 48, 3,
    )
    assert (out[1].format, out[1].width, out[1].height) == ("jpeg", 320, 200)
    assert (out[2].format, out[2].width, out[2].height) == ("gif", 12, 34)
    # unrecognized payloads are kept with NULL classification
    assert out[3].format is None and out[3].width is None
    assert out[4].format is None
    assert all(r.n_bytes > 0 for r in out.values())


def test_headers_decoder_routes_from_feature_entrypoint(spark):
    media = spark.createDataFrame([(0, "image", FX.make_png(5, 5), {})], MEDIA_SCHEMA)
    out = extract_media_features(media, decoder="headers").collect()
    assert out[0].format == "png" and out[0].width == 5


def _wav_bytes(channels=2, rate=16000) -> bytes:
    """Author a REAL (tiny) WAV via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * 4)
    return buf.getvalue()


def _mp4_bytes(width=640, height=360) -> bytes:
    """Hand-assembled minimal ISO-BMFF: ftyp + moov>trak>tkhd with
    16.16 fixed-point presentation size in the tkhd tail."""

    def box(btype: bytes, body: bytes) -> bytes:
        return (8 + len(body)).to_bytes(4, "big") + btype + body

    tkhd_body = b"\x00" * 76 + (width << 16).to_bytes(4, "big") + (
        height << 16
    ).to_bytes(4, "big")
    moov = box(b"moov", box(b"trak", box(b"tkhd", tkhd_body)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_parse_audio_and_video_headers():
    from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (
        parse_audio_header,
        parse_video_header,
    )

    assert parse_audio_header(_wav_bytes(2, 16000)) == ("wav", 2, 16000)
    assert parse_audio_header(_wav_bytes(1, 44100)) == ("wav", 1, 44100)
    assert parse_audio_header(b"RIFFxxxxNOPE") is None
    assert parse_audio_header(b"") is None

    assert parse_video_header(_mp4_bytes(640, 360)) == ("mp4", 640, 360)
    # ftyp with no moov: format identified, dims unknown
    assert parse_video_header(_mp4_bytes()[:24]) == ("mp4", None, None)
    assert parse_video_header(b"\x00\x00\x00\x08free") is None


def test_probe_routes_audio_video(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        probe_media_headers,
    )

    rows = [
        (1, "audio", bytearray(_wav_bytes(2, 22050)), {}),
        (2, "video", bytearray(_mp4_bytes(320, 240)), {}),
        (3, "audio", bytearray(b"not a riff"), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in probe_media_headers(media).collect()}
    assert (out[1].format, out[1].channels, out[1].sample_rate) == ("wav", 2, 22050)
    assert (out[2].format, out[2].width, out[2].height) == ("mp4", 320, 240)
    assert out[2].sample_rate is None
    assert out[3].format is None


def test_header_parsers_never_raise_on_fuzz():
    """The probe tier consumes UNTRUSTED bytes; every parser must
    classify-or-None, never raise — including on truncations of valid
    payloads (the classic crash vector) and random garbage seeded with
    real magic bytes."""
    import random

    from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (
        parse_audio_header,
        parse_image_header,
        parse_video_header,
    )

    rng = random.Random(7)
    valid = [
        _wav_bytes(2, 16000),
        _mp4_bytes(640, 360),
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + b"\x00" * 17,
        b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 32,
        b"GIF89a\x10\x00\x20\x00" + b"\x00" * 8,
    ]
    magics = [b"RIFF", b"WAVE", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a",
              b"\x00\x00\x00\x18ftyp", b"moov", b"tkhd"]
    cases = []
    for v in valid:
        for cut in range(0, len(v), max(1, len(v) // 17)):
            cases.append(v[:cut])  # truncations
        mutated = bytearray(v)
        for _ in range(8):  # bit flips
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
        cases.append(bytes(mutated))
    for _ in range(300):  # magic-seeded garbage
        cases.append(
            rng.choice(magics) + bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        )
    for c in cases:
        for parser in (parse_image_header, parse_audio_header, parse_video_header):
            out = parser(c)  # must not raise
            assert out is None or isinstance(out, tuple)


def test_mp4_largesize_and_size0_boxes():
    """ISO-BMFF's other legal size encodings (ISO 14496-12 section 4.2):
    size==1 reads the 64-bit largesize; size==0 extends the box to the
    end of its bound; a dimension-less first track must not abort the
    walk before a later sibling with real dimensions."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.multimodal import (
        _box,
        _box_largesize,
        _tkhd,
        demo_media_payloads,
        parse_video_header,
    )

    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")

    # largesize moov behind an audio (no-dims) first track
    large = dict((m, c) for m, _, c in [(m, t, c) for m, t, c in demo_media_payloads()])[6]
    assert parse_video_header(large) == ("mp4", 1920, 1080)

    # size==0: moov extends to end-of-file
    moov_body = _box(b"trak", _tkhd(128, 96))
    size0 = ftyp + (0).to_bytes(4, "big") + b"moov" + moov_body
    assert parse_video_header(size0) == ("mp4", 128, 96)

    # corrupt sibling before moov: that level stops (offset unknowable),
    # but the payload still classifies as mp4
    corrupt = ftyp + (3).to_bytes(4, "big") + b"free" + ftyp
    assert parse_video_header(corrupt) == ("mp4", None, None)

    # largesize with truncated 64-bit field: classified, no dims, no raise
    trunc = ftyp + (1).to_bytes(4, "big") + b"moov" + b"\x00\x00"
    assert parse_video_header(trunc) == ("mp4", None, None)

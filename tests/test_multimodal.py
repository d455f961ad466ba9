"""Multimodal plumbing: binary columns through mapInPandas pipelines."""

from __future__ import annotations

import pytest

from metadata_driven_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_feature_decoder,
    media_metadata_stats,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNG fake bytes 1", 640, 480, None),
        ("m2", "image", "image/png", b"\x89PNG fake bytes 2", 1280, 720, None),
        ("m3", "audio", "audio/wav", b"RIFF fake wav", None, None, 120_000),
        ("m4", "video", "video/mp4", b"\x00\x00ftyp fake mp4", 1920, 1080, 60_000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert len(out) == 4
    m1 = out["m1"]
    assert m1.n_bytes == len(b"\x89PNG fake bytes 1")
    assert m1.feature == [pytest.approx(x) for x in
                          fake_feature_decoder(b"\x89PNG fake bytes 1")]
    # content-addressable: same payload → same hash; different → different
    assert out["m1"].content_hash != out["m2"].content_hash


def test_sample_frames_with_injected_extractor(media):
    def fake_frames(payload: bytes, every: int) -> list[bytes]:
        return [payload[:4], payload[4:8]]

    frames = sample_frames(media, every_n=5, frame_extractor=fake_frames).collect()
    assert [(f.media_id, f.frame_index) for f in frames] == [("m4", 0), ("m4", 5)]


def test_sample_frames_without_codec_raises(media):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        sample_frames(media, every_n=5).collect()


def test_metadata_stats_prunes_payload(media):
    stats = media_metadata_stats(media)
    rows = {r.media_type: r for r in stats.collect()}
    assert rows["image"].n_items == 2
    assert rows["image"].avg_width == pytest.approx((640 + 1280) / 2)

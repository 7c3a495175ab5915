"""Multimodal plumbing: schemas, mapInPandas batch shapes, stub decoders."""

from __future__ import annotations

import pytest

from blueetl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes([1, 2, 3, 4]), {"src": "a"}),
        (2, "image", bytes([9, 9, 9]), None),
        (3, "audio", bytes(range(64)), {"src": "b"}),
        (4, "video", bytes(range(128)), {"src": "c"}),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA).cache()


def test_image_features_deterministic(media):
    out1 = mm.extract_image_features(media).toPandas().sort_values("media_id")
    out2 = mm.extract_image_features(media).toPandas().sort_values("media_id")
    assert list(out1.media_id) == [1, 2]  # audio row filtered out
    assert (out1.feature_hash.to_numpy() == out2.feature_hash.to_numpy()).all()
    assert ((out1.width >= 64) & (out1.width < 256)).all()
    assert ((out1.mean_luma >= 0) & (out1.mean_luma <= 1)).all()


def test_audio_frame_sampling(media):
    out = mm.sample_audio_frames(media, n_frames=4).toPandas()
    assert list(out.media_id.unique()) == [3]
    assert sorted(out.frame) == [0, 1, 2, 3]
    assert (out.rms > 0).all()


def test_resize_stub_raises_without_decoder(media):
    with pytest.raises(Exception, match="PIL/cv2"):
        mm.resize_images(media, 32, 32).collect()


def test_resize_with_identity_resizer(media):
    out = mm.resize_images(media, 32, 32, resize=lambda p, w, h: p).toPandas()
    assert len(out) == 4
    assert all(m["width"] == "32" for m in out.meta)
    # payload preserved byte-for-byte by the identity resizer
    row = out[out.media_id == 1].iloc[0]
    assert bytes(row.payload) == bytes([1, 2, 3, 4])


def test_video_frame_sampling(media):
    out = mm.sample_video_frames(media, n_frames=3).toPandas()
    assert list(out.media_id.unique()) == [4]  # only the video row
    assert sorted(out.frame_index) == [0, 1, 2]
    assert out.timestamp_s.is_monotonic_increasing
    assert all(isinstance(f, (bytes, bytearray)) and len(f) == 32 for f in out.frame)
    # deterministic across runs
    out2 = mm.sample_video_frames(media, n_frames=3).toPandas()
    assert list(out.frame) == list(out2.frame)
    # payload column is gone from the output schema
    assert "payload" not in out.columns


def test_video_frame_custom_decoder(media):
    def dec(payload, n):
        return [(float(i), b"x" * 4) for i in range(n)]

    out = mm.sample_video_frames(media, n_frames=2, decode=dec).toPandas()
    assert list(out.timestamp_s) == [0.0, 1.0]

"""Multimodal plumbing tests: real image resize, rawrgb video frame sampling,
pcm16 audio features, and NotImplementedError stubs for absent codecs."""

import numpy as np
import pytest

from osm_public_space_mapper_spark.fixtures.images import generate_images, images_to_spark
from osm_public_space_mapper_spark.images.codec import decode_image, synth_pixels, encode_raw
from osm_public_space_mapper_spark.operators import multimodal as MM


def test_resize_roundtrip(spark):
    df = images_to_spark(spark, generate_images(30, seed=11, with_pixels=True))
    out = MM.resize_images(df, 24, 18).collect()
    assert len(out) == 30
    for r in out:
        px = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        assert px.shape == (18, 24, 3)
    # determinism: same input → same bytes
    out2 = {r.image_id: bytes(r.bytes) for r in MM.resize_images(df, 24, 18).collect()}
    assert {r.image_id: bytes(r.bytes) for r in out} == out2


def test_video_frame_sampling_rawrgb(spark):
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 255, (25, 8, 12, 3)).astype(np.uint8)
    rows = [("vid-1", frames.tobytes(), "rawrgb", 12, 8, 25, 10.0)]
    df = spark.createDataFrame(rows, MM.VIDEO_SCHEMA)
    out = MM.sample_frames(df, every_n=10).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 10, 20]
    px = decode_image(bytes(out[0].frame_png), 12, 8, "png")
    target = frames[sorted(r.frame_idx for r in out)[0]]
    assert np.array_equal(px, target)


def test_video_stub_raises(spark):
    rows = [("vid-2", b"\x00" * 64, "mp4", 4, 4, 10, 30.0)]
    df = spark.createDataFrame(rows, MM.VIDEO_SCHEMA)
    with pytest.raises(Exception) as exc:
        MM.sample_frames(df).collect()
    assert "NotImplementedError" in str(exc.value) or "no container decoder" in str(exc.value)


def test_audio_features_pcm16_and_stub(spark):
    t = np.arange(16000)
    wave = (np.sin(2 * np.pi * 440 * t / 16000) * 10000).astype(np.int16)
    rows = [("aud-1", wave.tobytes(), "pcm16", 16000, 16000)]
    df = spark.createDataFrame(rows, MM.AUDIO_SCHEMA)
    r = MM.audio_features(df).collect()[0]
    assert abs(r.duration_s - 1.0) < 1e-9
    assert abs(r.rms - 10000 / np.sqrt(2)) < 100
    assert 850 < r.zero_crossings < 900  # 440 Hz → ~880 crossings/s

    bad = spark.createDataFrame([("aud-2", b"xx", "mp3", 44100, 100)], MM.AUDIO_SCHEMA)
    with pytest.raises(Exception) as exc:
        MM.audio_features(bad).collect()
    assert "NotImplementedError" in str(exc.value) or "no codec" in str(exc.value)

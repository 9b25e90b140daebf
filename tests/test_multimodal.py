"""Multimodal plumbing: real PPM/WAV codecs, schema, batch shape,
determinism, and the explicit NotImplementedError gate for formats that
need codec libraries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from netml_spark.operators.multimodal import (
    audio_features, decode_ppm, decode_wav, encode_ppm, encode_wav,
    frame_sample, gen_fake_media, image_features, image_resize,
    mean_pool_resize,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.random((24, 17, 3)) * 255).astype(np.uint8)
    back = decode_ppm(encode_ppm(img))
    assert back.shape == (24, 17, 3)
    np.testing.assert_allclose(back * 255.0, img, atol=0.51)
    gray = (rng.random((9, 5, 1)) * 255).astype(np.uint8)
    assert decode_ppm(encode_ppm(gray)).shape == (9, 5, 1)


def test_wav_roundtrip():
    t = np.arange(1600) / 16000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    back, rate = decode_wav(encode_wav(x, 16000))
    assert rate == 16000 and len(back) == 1600
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_mean_pool_resize():
    img = np.ones((32, 32, 3), dtype=np.float32) * 0.5
    out = mean_pool_resize(img, 8, 8)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_image_features_shape_and_determinism(spark):
    media = gen_fake_media(spark, n=32)
    out1 = image_features(media, out_dim=16).toPandas().set_index("media_id")
    out2 = image_features(media, out_dim=16).toPandas().set_index("media_id")
    assert len(out1) == 32
    assert all(len(v) == 16 for v in out1["features"])
    # deterministic (real PPM/WAV decode for image/audio; seeded stub for video)
    for mid in out1.index:
        assert list(out1.loc[mid, "features"]) == list(out2.loc[mid, "features"])


def test_image_resize_stage(spark):
    media = gen_fake_media(spark, n=12).filter(F.col("kind") == "image")
    out = image_resize(media, out_h=8, out_w=8).toPandas()
    assert len(out) > 0 and (out.width == 8).all() and (out.height == 8).all()
    img = decode_ppm(out.iloc[0]["payload"])
    assert img.shape == (8, 8, 3)


def test_audio_features_real_decode(spark):
    media = gen_fake_media(spark, n=12).filter(F.col("kind") == "audio")
    out = audio_features(media, n_mel_ish=8).toPandas()
    assert len(out) > 0
    assert (out.rms > 0.2).all() and (out.rms < 0.45).all()  # 0.5*sin -> rms ~0.35
    assert all(len(b) == 8 for b in out.bands)
    # a pure tone concentrates the spectrum: centroid near the tone freq band
    assert (out.spectral_centroid > 50).all()


def test_frame_sample(spark):
    media = gen_fake_media(spark, n=30)
    vids = media.filter(F.col("kind") == "video")
    out = frame_sample(vids, every_n=10).toPandas()
    n_expected = sum(
        len(range(0, r.n_frames, 10)) for r in vids.select("n_frames").collect()
    )
    assert len(out) == n_expected
    assert (out.frame_idx % 10 == 0).all()


def test_real_decode_gate(spark):
    """Opaque (video) payloads with fallback='error' hit the marked
    NotImplementedError — compressed-format codecs are out of scope."""
    media = gen_fake_media(spark, n=9).filter(F.col("kind") == "video")
    with pytest.raises(Exception) as ei:
        image_features(media, fallback="error").collect()
    assert "NotImplementedError" in str(ei.value) or "codec library" in str(ei.value)

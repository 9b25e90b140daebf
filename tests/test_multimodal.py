"""Multimodal plumbing: schema, batch shape, determinism of the stubbed
decode, and the explicit NotImplementedError gate for real decoding."""

import pytest
from pyspark.sql import functions as F

from netml_spark.operators.multimodal import (
    frame_sample, gen_fake_media, image_features,
)


def test_image_features_shape_and_determinism(spark):
    media = gen_fake_media(spark, n=32)
    out1 = image_features(media, out_dim=16).toPandas().set_index("media_id")
    out2 = image_features(media, out_dim=16).toPandas().set_index("media_id")
    assert len(out1) == 32
    assert all(len(v) == 16 for v in out1["features"])
    # deterministic fake decode
    for mid in out1.index:
        assert list(out1.loc[mid, "features"]) == list(out2.loc[mid, "features"])


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
    media = gen_fake_media(spark, n=3)
    with pytest.raises(Exception) as ei:
        image_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real image decode" in str(ei.value)

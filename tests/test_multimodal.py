"""Multimodal plumbing: schema in/out, poison-row capture, UDTF fan-out.
The decode is the deterministic IMG1 fake (container has no codec libs);
what these tests pin is the Spark contract around it."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.operators.multimodal import (
    decode_features,
    fake_encode_image,
    frame_sample,
    resize_images,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", fake_encode_image(8, 4, seed=1), {"src": "a"}),
        (2, "image", fake_encode_image(16, 16, seed=2), {"src": "b"}),
        (3, "image", b"\x00garbage", {"src": "c"}),          # corrupt
        (4, "audio", b"RIFFxxxx", {"src": "d"}),              # other kind
        (5, "video", fake_encode_image(4, 4, 3) + fake_encode_image(4, 4, 4)
         + fake_encode_image(4, 4, 5), {"src": "e"}),
    ]
    pdf = pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf)


def test_decode_features_and_poison_rows(spark, assets):
    out = {r["asset_id"]: r for r in decode_features(assets, "image").collect()}
    assert set(out) == {1, 2, 3}          # kind filter pruned audio/video
    assert out[1]["width"] == 8 and out[1]["height"] == 4
    assert out[2]["width"] == 16
    assert 0 <= out[1]["mean_intensity"] <= 255
    assert out[3]["error"] is not None and out[3]["width"] is None


def test_resize_round_trip(spark, assets):
    resized = resize_images(
        assets.where(F.col("kind") == "image"), out_w=4, out_h=2
    )
    rows = {r["asset_id"]: bytes(r["payload"]) for r in resized.collect()}
    assert set(rows) == {1, 2}  # corrupt asset silently dropped
    import struct

    for payload in rows.values():
        w, h = struct.unpack_from("<HH", payload, 4)
        assert (w, h) == (4, 2)
        assert len(payload) == 8 + 8


def test_frame_sample_fanout(spark, assets):
    frames = frame_sample(
        assets.where(F.col("kind") == "video"), every_n=2
    ).collect()
    # 3 frames, every 2nd -> indices 0 and 2
    assert sorted(r["frame_idx"] for r in frames) == [0, 2]
    for r in frames:
        assert bytes(r["frame"])[:4] == b"IMG1"

"""Multimodal plumbing: schema in/out, poison-row capture, UDTF fan-out.
The decode is the deterministic IMG1 fake (container has no codec libs);
what these tests pin is the Spark contract around it."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from audio_quality_checker_spark.operators.multimodal import (
    audio_features,
    decode_features,
    fake_encode_audio,
    fake_encode_image,
    frame_sample,
    image_near_dups,
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


def test_audio_features_analytic(spark):
    """A full-scale square wave has rms = peak = 1 and zcr ~ f/Nyquist —
    the feature math is exact, only the container is fake."""
    rate = 1000
    t = np.arange(rate)  # 1 second
    square = np.sign(np.sin(2 * np.pi * 25 * t / rate))  # 25 Hz
    rows = [
        (1, "audio", fake_encode_audio(square, rate), None),
        (2, "audio", fake_encode_audio(0.5 * np.ones(100), rate), None),
        (3, "audio", b"not audio", None),  # poison
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, meta map<string,string>"
    )
    out = {r["asset_id"]: r for r in audio_features(assets).collect()}
    sq = out[1]
    assert sq["n_samples"] == rate and abs(sq["duration_s"] - 1.0) < 1e-9
    assert abs(sq["rms"] - 1.0) < 1e-3 and abs(sq["peak"] - 1.0) < 1e-3
    # 25 Hz square wave crosses zero 2*25 = 50 times per second
    assert abs(sq["zcr"] * (rate - 1) - 50) <= 2
    dc = out[2]
    assert abs(dc["rms"] - 0.5) < 1e-3 and dc["zcr"] == 0.0
    assert out[3]["error"] is not None


def test_image_near_dups_via_ahash(spark):
    """A copy of an image with a few pixels changed shares its aHash
    within a small hamming radius; unrelated random images do not."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(30):
        rows.append((i, "image", fake_encode_image(32, 32, seed=100 + i), None))
    # near-dup of asset 0: same seed, flip a handful of pixels
    base = bytearray(fake_encode_image(32, 32, seed=100))
    for p in range(5):
        base[8 + 37 * p] = (base[8 + 37 * p] + 40) % 256
    rows.append((500, "image", bytes(base), None))
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary, meta map<string,string>"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(assets, max_hamming=5).collect()
    }
    assert (0, 500) in pairs, f"planted visual near-dup missed: {pairs}"
    # random 32x32 noise images shouldn't collide within hamming 5
    false_pairs = {k for k in pairs if k != (0, 500)}
    assert len(false_pairs) <= 1, f"too many accidental pairs: {false_pairs}"


def test_ahash_cells_vectorized_matches_looped_reference():
    """The reduceat grid means must equal the per-cell slice .mean() the
    operator originally used, for non-multiple-of-8 shapes included."""
    rng = np.random.default_rng(3)
    for h, w in [(8, 8), (17, 23), (64, 64), (100, 37), (9, 250)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ys = (np.arange(9) * h // 8)
        xs = (np.arange(9) * w // 8)
        looped = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                looped[i, j] = img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
        col_sums = np.add.reduceat(img.astype(np.int64), xs[:-1], axis=1)
        cell_sums = np.add.reduceat(col_sums, ys[:-1], axis=0)
        vec = cell_sums / np.outer(np.diff(ys), np.diff(xs))
        assert np.array_equal(vec, looped), (h, w)


def test_real_codec_decode_when_pil_present(spark):
    """With PIL installed, a real PNG payload must decode through the
    actual codec (skipped in containers without PIL — the IMG1 tests
    above cover the plumbing there)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from audio_quality_checker_spark.operators.multimodal import (
        decode_features,
    )

    arr = (np.arange(30 * 20, dtype=np.uint8) % 251).reshape(30, 20)
    buf = io.BytesIO()
    PIL_Image.fromarray(arr, mode="L").save(buf, format="PNG")
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "kind": ["image"],
             "payload": [buf.getvalue()],
             "meta": [{}]}
        )
    )
    row = decode_features(assets).collect()[0]
    assert row["error"] is None
    assert (row["width"], row["height"]) == (20, 30)
    assert abs(row["mean_intensity"] - float(arr.mean())) < 1e-9


def test_real_container_without_pil_is_poison_row(spark):
    """A non-IMG1 payload without a codec library must become an error
    row naming the missing codec, never a task failure."""
    from audio_quality_checker_spark.operators import multimodal as mm

    if mm._HAS_PIL:
        pytest.skip("PIL installed: the real-codec path applies instead")
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "kind": ["image"],
             "payload": [b"\x89PNG\r\n\x1a\n" + b"\x00" * 64],
             "meta": [{}]}
        )
    )
    row = mm.decode_features(assets).collect()[0]
    assert row["width"] is None
    assert "codec" in row["error"]


def test_audio_features_decodes_real_wav(spark):
    """A REAL RIFF/WAVE PCM payload (stdlib `wave` writer — no optional
    dependency) must decode through the actual container path: known
    sine -> known rms/duration/zcr; a truncated WAV is a poison row,
    not a task failure."""
    import io
    import wave

    import numpy as np

    from audio_quality_checker_spark.operators.multimodal import (
        audio_features,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    s16 = (sine * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s16.tobytes())
    good = buf.getvalue()
    # stereo variant: same signal duplicated -> downmix must be identical
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            np.repeat(s16, 2).tobytes()
        )
    stereo = buf2.getvalue()
    corrupt = good[:40]  # RIFF header intact, data truncated mid-header

    assets = spark.createDataFrame(
        [(1, "audio", bytearray(good), {}),
         (2, "audio", bytearray(stereo), {}),
         (3, "audio", bytearray(corrupt), {})],
        "asset_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = {r["asset_id"]: r for r in audio_features(assets).collect()}
    assert rows[1]["error"] is None
    assert rows[1]["n_samples"] == rate
    assert abs(rows[1]["duration_s"] - 1.0) < 1e-9
    # sine rms = amp/sqrt(2)
    assert abs(rows[1]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(rows[2]["rms"] - rows[1]["rms"]) < 1e-9  # downmix identity
    assert rows[3]["error"] is not None and rows[3]["n_samples"] is None

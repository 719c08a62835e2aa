"""Multimodal mapInPandas operators: resize, feature extraction, video frame
sampling, audio windowing — Spark plumbing exercised end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.functions.image import (
    decode_image_np,
    encode_image_np,
    psnr_np,
)
from datastream_deltalake_connector_spark.functions.multimodal import (
    audio_features,
    extract_features,
    make_fake_video,
    resize_images,
    sample_video_frames,
)

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def images_df(spark):
    rows = []
    for i in range(12):
        px = RNG.integers(0, 256, size=(20 + i, 30 + i, 3), dtype=np.uint8)
        fmt = "png" if i % 2 else "jpeg"
        rows.append((f"img{i:02d}", encode_image_np(px, fmt), fmt))
    return spark.createDataFrame(rows, ["image_id", "bytes", "fmt"]).cache()


def test_resize_shapes_and_content(spark, images_df):
    out = resize_images(images_df, 16, 12).collect()
    assert len(out) == 12
    for r in out:
        assert (r["w"], r["h"]) == (16, 12)
        px = decode_image_np(r["frame_bytes"] if "frame_bytes" in r else r["bytes"])
        assert px.shape == (12, 16, 3)


def test_resize_identity_when_same_size(spark):
    px = RNG.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame([("a", encode_image_np(px, "png"), "png")],
                               ["image_id", "bytes", "fmt"])
    out = resize_images(df, 16, 12).collect()[0]
    assert psnr_np(decode_image_np(out["bytes"]), px) == 99.0


def test_extract_features(spark, images_df):
    feats = extract_features(images_df).collect()
    assert len(feats) == 12
    for r in feats:
        assert 0 <= r["brightness"] <= 255
        assert r["contrast"] >= 0
        assert r["edge_energy"] > 0
        assert r["colorfulness"] > 0


def test_video_frame_sampling(spark):
    rows = [(f"v{i}", make_fake_video(f"v{i}", n_frames=25, seed=i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["video_id", "bytes"])
    frames = sample_video_frames(df, every_nth=10).collect()
    # 25 frames sampled every 10th → indices 0,10,20 per video
    assert len(frames) == 9
    assert sorted({r["frame_index"] for r in frames}) == [0, 10, 20]
    px = decode_image_np(frames[0]["frame_bytes"])
    assert px.shape == (12, 16, 3)


def test_video_real_codec_gated(spark):
    df = spark.createDataFrame([("v", b"\x00\x00\x00\x18ftypmp42-fake-mp4-header")],
                               ["video_id", "bytes"])
    with pytest.raises(Exception) as exc_info:
        sample_video_frames(df).collect()
    assert "NotImplementedError" in str(exc_info.value) or "media library" in str(
        exc_info.value
    )


def test_audio_features(spark):
    pcm = (np.sin(np.linspace(0, 400 * np.pi, 5000)) * 0.5).astype(np.float32)
    df = spark.createDataFrame([("a1", pcm.tobytes()), ("a2", b"")],
                               ["audio_id", "bytes"])
    out = {r["audio_id"]: r for r in audio_features(df, window=1024).collect()}
    assert out["a1"]["n_windows"] == 4
    assert all(0.2 < v < 0.5 for v in out["a1"]["rms"])  # sine RMS ≈ 0.35
    assert out["a2"]["n_windows"] == 0

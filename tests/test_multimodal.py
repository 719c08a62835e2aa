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


# ------------------------------------------------------------- MJPEG-in-AVI
def _gradient_frame(f: int, w: int = 24, h: int = 16) -> np.ndarray:
    y, x, c = np.meshgrid(np.arange(h), np.arange(w), np.arange(3), indexing="ij")
    return (5 * f + 3 * y + 3 * x + 30 * c).astype(np.uint8)


def _mjpeg_avi(n_frames: int, w: int = 24, h: int = 16) -> bytes:
    from datastream_deltalake_connector_spark.functions.avi import encode_avi_mjpeg
    from datastream_deltalake_connector_spark.functions.jpeg import encode_jpeg_np

    return encode_avi_mjpeg(
        [encode_jpeg_np(_gradient_frame(f, w, h), quality=95) for f in range(n_frames)],
        w,
        h,
    )


def test_avi_roundtrip_and_info():
    from datastream_deltalake_connector_spark.functions.avi import (
        avi_info,
        decode_avi_frames,
    )
    from datastream_deltalake_connector_spark.functions.jpeg import decode_jpeg_np

    data = _mjpeg_avi(7)
    info = avi_info(data)
    assert (info["n_frames"], info["w"], info["h"], info["streams"]) == (7, 24, 16, 1)
    payloads, w, h = decode_avi_frames(data)
    assert (len(payloads), w, h) == (7, 24, 16)
    for f, p in enumerate(payloads):
        assert p[:2] == b"\xff\xd8"  # each record is a standalone JFIF stream
        assert psnr_np(decode_jpeg_np(p), _gradient_frame(f)) >= 40.0


def test_avi_tolerates_rec_lists_and_00db_and_skips_audio():
    """Interleaved real-world AVIs wrap frames in 'rec ' lists, may spell
    the fourcc 00db, and carry audio '01wb' records between frames."""
    import struct

    from datastream_deltalake_connector_spark.functions.avi import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )
    from datastream_deltalake_connector_spark.functions.jpeg import encode_jpeg_np

    jf = [encode_jpeg_np(_gradient_frame(f), quality=95) for f in range(3)]
    plain = encode_avi_mjpeg(jf, 24, 16)

    def chunk(cc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad

    rec = chunk(b"LIST", b"rec " + chunk(b"00db", jf[1]) + chunk(b"01wb", b"\x01\x02\x03"))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jf[0]) + rec + chunk(b"00dc", jf[2]))
    hdrl_start = plain.index(b"LIST")
    (hdrl_size,) = struct.unpack_from("<I", plain, hdrl_start + 4)
    hdrl = plain[hdrl_start : hdrl_start + 8 + hdrl_size]
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    payloads, w, h = decode_avi_frames(data)
    assert (len(payloads), w, h) == (3, 24, 16)
    assert payloads == [bytes(j) for j in jf]


def test_avi_malformed_raises_valueerror():
    from datastream_deltalake_connector_spark.functions.avi import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")  # not an AVI form
    with pytest.raises(ValueError):
        decode_avi_frames(_mjpeg_avi(2)[:60])  # truncated mid-header
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8)


def test_sample_video_frames_avi_path(spark):
    """The production sampler sniffs RIFF/'AVI ', walks the container, and
    entropy-decodes ONLY the sampled frames; pixels must clear 40 dB vs the
    rule (JPEG is lossy, the gradient class survives quantization)."""
    rows = [(f"av{i}", _mjpeg_avi(9)) for i in range(2)]
    df = spark.createDataFrame(rows, ["video_id", "bytes"])
    out = sample_video_frames(df, every_nth=4).collect()
    assert len(out) == 6  # indices 0, 4, 8 per video
    for r in out:
        assert (r["w"], r["h"]) == (24, 16)
        px = decode_image_np(r["frame_bytes"])
        assert psnr_np(px, _gradient_frame(r["frame_index"])) >= 40.0

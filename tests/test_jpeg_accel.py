"""Optional accelerated-JPEG gate (functions/jpeg.py `_detect_accel`).

The container ships no image library, so the from-scratch T.81 decoder is
the only path that runs here; these tests pin the GATE contract instead:
detection honors the kill switch, `decode_jpeg_np` routes through an accel
decoder when one is installed, any accel failure falls back to the pure
decoder (capability never shrinks), and — when a real accel lib ever lands
in the image — a parity test (dims exact, PSNR ≥ 40 dB) runs automatically.
Mirrors the `google-cloud-storage` / `snappy` optional-dependency pattern.
"""

from __future__ import annotations

import numpy as np
import pytest

from datastream_deltalake_connector_spark.functions import jpeg
from datastream_deltalake_connector_spark.functions.image import psnr_np
from datastream_deltalake_connector_spark.functions.jpeg import (
    decode_jpeg_np,
    encode_jpeg_np,
)

RNG = np.random.default_rng(23)


def _smooth(h: int, w: int, c: int = 3) -> np.ndarray:
    """Low-frequency test image (JPEG-friendly, high PSNR after roundtrip)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
    px = np.stack([base + 20 * k for k in range(c)], axis=-1)
    return np.clip(px + RNG.normal(0, 2, px.shape), 0, 255).astype(np.uint8)


def test_detect_accel_kill_switch(monkeypatch):
    monkeypatch.setenv("DATASTREAM_JPEG_ACCEL", "0")
    dec, name = jpeg._detect_accel()
    assert dec is None and name == "disabled"


def test_detect_accel_names_a_real_state():
    # whatever the container has, detection must land on a known label
    assert jpeg._ACCEL_NAME in ("pure", "simplejpeg", "PIL", "cv2", "disabled")
    assert (jpeg._ACCEL_DECODER is None) == (jpeg._ACCEL_NAME in ("pure", "disabled"))


def test_pure_route_when_no_accel(monkeypatch):
    monkeypatch.setattr(jpeg, "_ACCEL_DECODER", None)
    px = _smooth(24, 40)
    data = encode_jpeg_np(px, quality=92)
    out = decode_jpeg_np(data)
    assert np.array_equal(out, jpeg._decode_jpeg_pure(data))


def test_accel_route_used_when_available(monkeypatch):
    sentinel = np.full((3, 5, 3), 7, np.uint8)
    calls = []

    def fake(data: bytes) -> np.ndarray:
        calls.append(len(data))
        return sentinel

    monkeypatch.setattr(jpeg, "_ACCEL_DECODER", fake)
    data = encode_jpeg_np(_smooth(16, 16), quality=90)
    out = decode_jpeg_np(data)
    assert calls == [len(data)]
    assert out is sentinel


def test_accel_failure_falls_back_to_pure(monkeypatch):
    def broken(data: bytes) -> np.ndarray:
        raise RuntimeError("native decoder rejected the stream")

    monkeypatch.setattr(jpeg, "_ACCEL_DECODER", broken)
    px = _smooth(24, 24)
    data = encode_jpeg_np(px, quality=92)
    out = decode_jpeg_np(data)
    assert np.array_equal(out, jpeg._decode_jpeg_pure(data))


def test_non_jpeg_rejected_before_accel(monkeypatch):
    # the SOI check guards BOTH paths — accel must never see non-JPEG bytes
    def explode(data: bytes) -> np.ndarray:  # pragma: no cover — must not run
        raise AssertionError("accel called on non-JPEG bytes")

    monkeypatch.setattr(jpeg, "_ACCEL_DECODER", explode)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_np(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(
    jpeg._ACCEL_DECODER is None,
    reason="no accelerated JPEG decoder in this container (pure path only)",
)
def test_real_accel_parity_vs_pure():
    # runs automatically if simplejpeg/PIL/cv2 ever lands in the image
    for px, kwargs in [
        (_smooth(48, 64), {"quality": 90}),
        (_smooth(33, 47), {"quality": 85, "subsample": True}),
        (_smooth(40, 40, 1), {"quality": 95}),
        (_smooth(48, 48), {"quality": 85, "progressive": True}),
    ]:
        data = encode_jpeg_np(px, **kwargs)
        accel = decode_jpeg_np(data)
        pure = jpeg._decode_jpeg_pure(data)
        assert accel.shape == pure.shape
        assert accel.dtype == np.uint8
        assert psnr_np(accel, pure) >= 40.0

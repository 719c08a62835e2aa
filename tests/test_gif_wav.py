"""Real WAV + GIF codecs: pure-numpy exactness (round-trips, hand-assembled
spec bytes independent of the engine encoder, honest gates) and the Spark
paths that consume them (frame sampling, audio RMS, dims probe)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from datastream_deltalake_connector_spark.functions.audio import (
    decode_wav_np,
    encode_wav_np,
    wav_info,
)
from datastream_deltalake_connector_spark.functions.gif import (
    decode_gif_np,
    encode_gif_np,
    gif_info,
)

RNG = np.random.default_rng(7)


# ----------------------------------------------------------------- WAV pure
def test_wav_roundtrip_all_depths_and_channels():
    x = RNG.uniform(-0.95, 0.95, size=(3000, 2))
    for bits, tol in ((16, 2 / 32768), (24, 2 / (1 << 23)), (32, 2 / (1 << 31)), (33, 1e-6)):
        data = encode_wav_np(x, 44100, bits=bits)
        y, rate = decode_wav_np(data)
        assert rate == 44100 and y.shape == x.shape
        assert np.abs(y - x).max() < tol, bits
    mono = encode_wav_np(x[:, 0], 8000, bits=16)
    y, _ = decode_wav_np(mono)
    assert y.shape == (3000, 1)


def test_wav_stdlib_cross_check_both_directions():
    """stdlib `wave` is an independent spec implementation: it must read the
    engine's bytes and the engine must read its bytes, sample-exactly."""
    pcm = np.round(RNG.uniform(-1, 1, 500) * 32767).astype("<i2")
    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(22050)
    wf.writeframes(pcm.tobytes())
    wf.close()
    y, rate = decode_wav_np(buf.getvalue())
    assert rate == 22050
    assert np.array_equal(np.round(y[:, 0] * 32768).astype(np.int16), pcm)

    data = encode_wav_np(pcm.astype(np.float64) / 32768.0, 16000, bits=16)
    rd = wave.open(io.BytesIO(data), "rb")
    assert (rd.getframerate(), rd.getnchannels(), rd.getsampwidth()) == (16000, 1, 2)
    back = np.frombuffer(rd.readframes(500), dtype="<i2")
    assert np.array_equal(back, pcm)


def test_wav_8bit_unsigned_and_extra_chunks():
    # 8-bit WAV is unsigned with midpoint 128; also insert a LIST chunk with
    # odd length (word-alignment padding) before data — the walk must skip it.
    samples = np.array([0, 64, 128, 192, 255], dtype=np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd_list = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + odd_list
        + b"data" + struct.pack("<I", len(samples)) + samples.tobytes()
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    y, rate = decode_wav_np(data)
    assert rate == 8000
    assert np.allclose(y[:, 0], (samples.astype(float) - 128) / 128)


def test_wav_g711_luts_match_ccitt_reference():
    """The vectorized expansion tables must equal the scalar CCITT G.711
    reference formulas (Sun g711.c arithmetic) for all 256 codewords."""
    from datastream_deltalake_connector_spark.functions.audio import (
        _ALAW_LUT,
        _ULAW_LUT,
    )

    def ulaw2linear(u: int) -> int:
        u = ~u & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2linear(a: int) -> int:
        a ^= 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    assert [int(v) for v in _ULAW_LUT] == [ulaw2linear(i) for i in range(256)]
    assert [int(v) for v in _ALAW_LUT] == [alaw2linear(i) for i in range(256)]


def test_wav_g711_roundtrip_and_idempotence():
    """µ-law/A-law WAV: container tags 0x0007/0x0006, 8 bits on the wire,
    stereo interleave preserved, ≥30 dB SNR on random program material, and
    encode∘decode idempotent (nearest-codeword quantizer fixed points)."""
    x = RNG.uniform(-0.9, 0.9, size=(800, 2))
    for bits, tag in ((7, 0x0007), (6, 0x0006)):
        data = encode_wav_np(x, 8000, bits=bits)
        info = wav_info(data)
        assert (info["format"], info["bits"], info["channels"]) == (tag, 8, 2)
        y, rate = decode_wav_np(data)
        assert rate == 8000 and y.shape == x.shape
        snr = 10 * np.log10(np.mean(x**2) / np.mean((y - x) ** 2))
        assert snr > 30, (bits, snr)
        # quantizer fixed point: re-encoding the decode is byte-identical
        assert encode_wav_np(y, 8000, bits=bits) == data
        # sign-correctness: a positive DC block decodes positive
        dc = decode_wav_np(encode_wav_np(np.full(16, 0.5), 8000, bits=bits))[0]
        assert (dc > 0.45).all() and (dc < 0.55).all()
        # spec container shape for non-PCM: 18-byte fmt (cbSize=0) + a fact
        # chunk carrying the per-channel sample count
        fmt_off = data.find(b"fmt ") + 4
        (fmt_size,) = struct.unpack_from("<I", data, fmt_off)
        assert fmt_size == 18
        fact_off = data.find(b"fact")
        assert fact_off > 0
        assert struct.unpack_from("<II", data, fact_off + 4) == (4, 800)


def test_wav_honest_gates():
    fmt = struct.pack("<HHIIHH", 0x0011, 1, 8000, 4000, 1, 4)  # IMA ADPCM
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 4) + b"\0" * 4
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        decode_wav_np(data)
    with pytest.raises(ValueError):
        decode_wav_np(b"RIFXjunk")
    assert wav_info(data)["format"] == 0x0011


# ----------------------------------------------------------------- GIF pure
def test_gif_roundtrip_multiframe_interlace_and_lzw_reset():
    frames = (RNG.integers(0, 6, size=(3, 25, 33, 3)) * 40).astype(np.uint8)
    data = encode_gif_np(frames, delays_cs=[2, 3, 4])
    dec, delays = decode_gif_np(data)
    assert np.array_equal(dec, frames) and delays == [2, 3, 4]
    assert gif_info(data) == {"w": 33, "h": 25, "n_frames": 3}

    inter = encode_gif_np(frames[0], interlace=True)
    assert np.array_equal(decode_gif_np(inter)[0][0], frames[0])

    # > 4096 dictionary entries → in-stream CLEAR + table reset path
    big = (RNG.integers(0, 16, size=(1, 200, 300, 1)).repeat(3, axis=3) * 16).astype(np.uint8)
    assert np.array_equal(decode_gif_np(encode_gif_np(big))[0], big)

    bw = (RNG.integers(0, 2, size=(2, 10, 10, 1)).repeat(3, axis=3) * 255).astype(np.uint8)
    assert np.array_equal(decode_gif_np(encode_gif_np(bw))[0], bw)


def test_gif_hand_assembled_spec_bytes():
    """A GIF built byte-by-byte with hand-packed LZW codes — fully independent
    of the engine encoder. 3x1 image, palette [red, blue], indices [0, 1, 0].
    Codes (width 3, LSB-first): CLEAR(100) 0(000) 1(100) 0(000) EOI(101)
    → bytes 0x44, 0x50."""
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x80, 0, 0)  # GCT flag, 2 colors
        + bytes([255, 0, 0, 0, 0, 255])  # red, blue
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2])  # LZW min code size
        + bytes([2, 0x44, 0x50])  # one sub-block of 2 bytes
        + b"\x00\x3b"
    )
    dec, _ = decode_gif_np(data)
    assert np.array_equal(
        dec[0], np.array([[[255, 0, 0], [0, 0, 255], [255, 0, 0]]], dtype=np.uint8)
    )
    assert gif_info(data) == {"w": 3, "h": 1, "n_frames": 1}


def test_gif_transparency_and_disposal_composition():
    """Hand-assembled 2-frame GIF: frame 2 is a 1x1 patch at (1,0) marked
    transparent on index 3 with disposal=restore-to-background — exercises
    GCE parsing, sub-rectangle blits, and canvas disposal, none of which the
    engine encoder emits."""
    from datastream_deltalake_connector_spark.functions.gif import _lzw_encode

    palette = bytes([10, 10, 10, 200, 0, 0, 0, 200, 0, 0, 0, 200])  # bg,R,G,B
    f1 = np.array([1, 2, 3, 1], dtype=np.uint8)  # 2x2: R G / B R
    lzw1 = _lzw_encode(f1, 2)
    f2 = np.array([2], dtype=np.uint8)  # 1x1 green patch at (left=1, top=0)
    lzw2 = _lzw_encode(f2, 2)
    f3 = np.array([3], dtype=np.uint8)  # transparent index 3 → no-op blit
    lzw3 = _lzw_encode(f3, 2)

    def img(left, top, w, h, lzw):
        return (
            b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            + bytes([2, len(lzw)]) + lzw + b"\x00"
        )

    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 colors, bg idx 0
        + palette
        + img(0, 0, 2, 2, lzw1)
        # GCE: disposal=2 (restore bg), transparency on, transparent idx 3
        + b"\x21\xf9\x04" + struct.pack("<BHB", (2 << 2) | 1, 5, 3) + b"\x00"
        + img(1, 0, 1, 1, lzw2)
        # third frame: transparent idx 3 pixels only → canvas unchanged where blitted
        + b"\x21\xf9\x04" + struct.pack("<BHB", 1, 0, 3) + b"\x00"
        + img(0, 1, 1, 1, lzw3)
        + b"\x3b"
    )
    dec, delays = decode_gif_np(data)
    assert dec.shape == (3, 2, 2, 3) and delays == [0, 5, 0]
    bg, red, green, blue = (
        np.array(c, np.uint8)
        for c in ([10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200])
    )
    assert np.array_equal(dec[0], np.stack([[red, green], [blue, red]]))
    # frame 2: green patch over (0,1)
    assert np.array_equal(dec[1][0, 1], green) and np.array_equal(dec[1][0, 0], red)
    # frame 3: the disposal=2 restored (0,1) to background; transparent blit
    # at (1,0) leaves the frame-1 blue intact
    assert np.array_equal(dec[2][0, 1], bg)
    assert np.array_equal(dec[2][1, 0], blue)


def test_gif_honest_gates():
    with pytest.raises(ValueError):
        decode_gif_np(b"NOTGIF" + b"\x00" * 32)
    with pytest.raises(ValueError):
        encode_gif_np(RNG.integers(0, 256, size=(1, 40, 40, 3)).astype(np.uint8))  # >256 colors


# ---------------------------------------------------------------- Spark path
def test_sample_video_frames_on_real_gif(spark):
    from datastream_deltalake_connector_spark.functions.image import decode_image_np
    from datastream_deltalake_connector_spark.functions.multimodal import (
        sample_video_frames,
    )

    vids = []
    expected = {}
    for i in range(3):
        n = 5 + i
        frames = (RNG.integers(0, 5, size=(n, 8, 9, 3)) * 50).astype(np.uint8)
        vids.append((f"g{i}", encode_gif_np(frames, interlace=bool(i % 2))))
        expected[f"g{i}"] = frames
    df = spark.createDataFrame(vids, ["video_id", "bytes"])
    out = sample_video_frames(df, every_nth=2).collect()
    assert len(out) == sum((len(f) + 1) // 2 for f in expected.values())
    for r in out:
        assert np.array_equal(
            decode_image_np(r["frame_bytes"]), expected[r["video_id"]][r["frame_index"]]
        )


def test_audio_features_on_real_wav(spark):
    from datastream_deltalake_connector_spark.functions.multimodal import audio_features

    sq = np.tile([0.5, -0.5], 1024)  # square wave, RMS exactly 0.5
    rows = [
        ("w16", encode_wav_np(sq, 16000, bits=16)),
        ("w24s", encode_wav_np(np.stack([sq, sq], axis=1), 16000, bits=24)),
        ("raw", sq.astype(np.float32).tobytes()),
    ]
    df = spark.createDataFrame(rows, ["audio_id", "bytes"])
    out = {r["audio_id"]: r for r in audio_features(df, window=512).collect()}
    for k in ("w16", "w24s", "raw"):
        assert out[k]["n_windows"] == 4
        assert all(abs(v - 0.5) < 1e-3 for v in out[k]["rms"]), k


def test_gif_through_dims_and_decode_dispatch(spark):
    from datastream_deltalake_connector_spark.functions.image import (
        decode_dims_udf,
        decode_image_np,
    )

    frames = (RNG.integers(0, 4, size=(2, 7, 11, 3)) * 60).astype(np.uint8)
    data = encode_gif_np(frames)
    assert np.array_equal(decode_image_np(data), frames[0])  # first frame
    row = (
        spark.createDataFrame([("g", data)], ["image_id", "bytes"])
        .select(decode_dims_udf("bytes").alias("dims"))
        .collect()[0]["dims"]
    )
    assert (row["w"], row["h"], row["channels"], row["lossy"]) == (11, 7, 3, 0)

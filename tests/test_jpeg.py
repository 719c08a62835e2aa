"""Real JPEG decode (functions/jpeg.py) vs an independent spec-faithful
test encoder.

The encoder below implements ITU T.81 baseline sequential ENCODING from the
spec text (forward DCT → quantize → zigzag → run-length + canonical Huffman
→ byte stuffing → JFIF markers), with its own valid Huffman tables
(fixed-length canonical codes — any spec-valid DHT is a real JPEG; the
decoder must honor whatever the stream declares). The engine decoder must
invert it within quantization error. Subsampling (4:2:0) and restart
markers are exercised explicitly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from datastream_deltalake_connector_spark.functions.image import (
    decode_image_np,
    psnr_np,
)
from datastream_deltalake_connector_spark.functions.jpeg import ZIGZAG, decode_jpeg_np

RNG = np.random.default_rng(11)

# quality-50 example tables from ITU T.81 Annex K (public spec constants)
_QL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_QC = np.full((8, 8), 99, dtype=np.int32)
_QC[:4, :4] = [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]]


def _quant(base: np.ndarray, quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _dct_basis() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0] /= np.sqrt(2.0)
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:  # pad with 1-bits (spec)
        while self.n:
            self.put(1, 1)


# fixed-length canonical Huffman tables: 12 DC categories at 4 bits,
# 256 possible AC run/size symbols at 9 bits (spec max is 16; 9 covers 256)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_BITS = [0] * 8 + [255, 1] + [0] * 6  # BITS entries are u8: 255 @ 9b + 1 @ 10b
_AC_VALS = bytes(range(256))


def _codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


_DC_CODE = _codes(_DC_BITS, _DC_VALS)
_AC_CODE = _codes(_AC_BITS, _AC_VALS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    c = _dct_basis()
    coef = np.round((c @ (block.astype(np.float64) - 128.0) @ c.T) / q).astype(int)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = _DC_CODE[s]
    w.put(code, length)
    if s:
        w.put(_magnitude(diff, s), s)
    run = 0
    last_nz = max(np.nonzero(zz[1:])[0]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODE[0xF0]
            w.put(code, length)
            run -= 16
        s = _category(v)
        code, length = _AC_CODE[(run << 4) | s]
        w.put(code, length)
        w.put(_magnitude(v, s), s)
        run = 0
    if last_nz < 63:
        code, length = _AC_CODE[0x00]  # EOB
        w.put(code, length)
    return int(zz[0])


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _make_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (test-side reference implementation)."""
    h, w = px.shape[:2]
    gray = px.shape[2] == 1 if px.ndim == 3 else True
    ql, qc = _quant(_QL, quality), _quant(_QC, quality)
    if gray:
        planes = [px[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # 4:2:0 — chroma is the 2x2 block mean (decimate on odd dims)
            cb = (cb[0::2, 0::2] + cb[1::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 1::2]) / 4 \
                if h % 2 == 0 and w % 2 == 0 else _pad_to(cb, 2)[0::2, 0::2]
            cr = (cr[0::2, 0::2] + cr[1::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 1::2]) / 4 \
                if h % 2 == 0 and w % 2 == 0 else _pad_to(cr, 2)[0::2, 0::2]
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so the MCU grid is complete
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        np.pad(
            np.clip(np.round(p), 0, 255),
            ((0, mcuy * s[1] * 8 - p.shape[0]), (0, mcux * s[0] * 8 - p.shape[1])),
            mode="edge",
        )
        for p, s in zip(planes, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, s in enumerate(samp):
        sof += bytes([i + 1, (s[0] << 4) | s[1], qids[i]])
    out += _seg(0xC0, sof)
    for cls in (0, 1):
        for tid in (0,) if gray else (0, 1):
            bits, vals = (_DC_BITS, _DC_VALS) if cls == 0 else (_AC_BITS, _AC_VALS)
            out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + vals)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        tid = 0 if (gray or i == 0) else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    writer = _BitWriter()
    preds = [0] * len(planes)
    qs = [ql if qid == 0 else qc for qid in qids]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.align()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (p, s) in enumerate(zip(padded, samp)):
            for by in range(s[1]):
                for bx in range(s[0]):
                    y0 = (my * s[1] + by) * 8
                    x0 = (mx * s[0] + bx) * 8
                    preds[ci] = _encode_block(
                        writer, p[y0 : y0 + 8, x0 : x0 + 8], qs[ci], preds[ci]
                    )
    writer.align()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _smooth_img(h: int, w: int, c: int = 3) -> np.ndarray:
    """Low-frequency content (bilinear-upsampled coarse noise) — the image
    class JPEG is built for; round-trip PSNR is then dominated by the
    decoder's correctness, not quantization of unrepresentable noise."""
    small = RNG.integers(40, 216, size=(max(h // 8, 2), max(w // 8, 2), c)).astype(float)
    ys = np.linspace(0, small.shape[0] - 1, h)
    xs = np.linspace(0, small.shape[1] - 1, w)
    y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
    y1, x1 = np.minimum(y0 + 1, small.shape[0] - 1), np.minimum(x0 + 1, small.shape[1] - 1)
    fy, fx = (ys - y0)[:, None, None], (xs - x0)[None, :, None]
    out = (
        small[y0][:, x0] * (1 - fy) * (1 - fx)
        + small[y1][:, x0] * fy * (1 - fx)
        + small[y0][:, x1] * (1 - fy) * fx
        + small[y1][:, x1] * fy * fx
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_jpeg_solid_color_near_exact():
    px = np.full((24, 16, 3), 0, np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 180, 90, 30
    out = decode_jpeg_np(_make_jpeg(px, quality=95))
    assert out.shape == px.shape
    assert psnr_np(px, out) >= 40


def test_jpeg_smooth_roundtrip_all_shapes():
    # odd dims exercise MCU padding + crop
    for (h, w) in [(32, 32), (17, 23), (8, 40), (31, 9)]:
        px = _smooth_img(h, w)
        out = decode_jpeg_np(_make_jpeg(px, quality=95))
        assert out.shape == (h, w, 3)
        assert psnr_np(px, out) >= 34, f"{h}x{w}: {psnr_np(px, out):.1f} dB"


def test_jpeg_grayscale():
    px = _smooth_img(20, 28, c=1)
    out = decode_jpeg_np(_make_jpeg(px, quality=95))
    assert out.shape == (20, 28, 1)
    assert psnr_np(px, out) >= 35


def test_jpeg_420_subsampling():
    # smooth chroma, structured luma — 4:2:0's design point
    px = _smooth_img(32, 48)
    out = decode_jpeg_np(_make_jpeg(px, quality=95, subsample=True))
    assert out.shape == (32, 48, 3)
    assert psnr_np(px, out) >= 30


def test_jpeg_restart_markers_match_unrestarted():
    px = _smooth_img(40, 40)
    plain = decode_jpeg_np(_make_jpeg(px, quality=90))
    restarted = decode_jpeg_np(_make_jpeg(px, quality=90, restart_interval=3))
    assert np.array_equal(plain, restarted)


def test_jpeg_dispatch_and_gates():
    px = _smooth_img(16, 16)
    data = _make_jpeg(px, quality=95)
    # decode_image_np sniffs FFD8 and routes to the JPEG decoder
    assert np.array_equal(decode_image_np(data), decode_jpeg_np(data))
    with pytest.raises(ValueError):
        decode_jpeg_np(b"NOPE")
    # a baseline stream relabeled SOF2 is CORRUPT progressive (its single
    # scan claims Ss=0, Se=63 — illegal for a progressive DC scan) and must
    # be rejected, not mis-decoded
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se != 0"):
        decode_jpeg_np(prog)
    # arithmetic coding stays honestly gated
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_np(arith)


def test_engine_jpeg_encoder_roundtrip():
    """Engine-side encode_jpeg_np emits standards-compliant baseline JFIF:
    the engine decoder inverts it within quantization error for 4:4:4,
    4:2:0, grayscale, and restart-interval streams, and jpeg_dims reads the
    header. (The decoder itself is pinned independently by the test-side
    encoder above.)"""
    from datastream_deltalake_connector_spark.functions.jpeg import (
        encode_jpeg_np,
        jpeg_dims,
    )

    px = _smooth_img(26, 34)
    for kwargs, floor in [
        (dict(quality=95), 40),
        (dict(quality=95, subsample=True), 34),
        (dict(quality=95, restart_interval=2), 40),
    ]:
        data = encode_jpeg_np(px, **kwargs)
        assert jpeg_dims(data) == (34, 26, 3)
        out = decode_jpeg_np(data)
        assert out.shape == px.shape
        assert psnr_np(px, out) >= floor, kwargs
    gray = _smooth_img(15, 11, c=1)
    out = decode_jpeg_np(encode_jpeg_np(gray, quality=95))
    assert out.shape == gray.shape and psnr_np(gray, out) >= 40
    with pytest.raises(ValueError):
        encode_jpeg_np(np.zeros((4, 4, 2), np.uint8))


def test_jpeg_dims_probe(spark):
    from datastream_deltalake_connector_spark.functions.image import decode_dims_udf

    px = _smooth_img(18, 26)
    df = spark.createDataFrame([("j1", _make_jpeg(px))], ["image_id", "bytes"])
    d = df.select(decode_dims_udf("bytes").alias("d")).collect()[0]["d"]
    assert (d["w"], d["h"], d["channels"], d["lossy"]) == (26, 18, 3, 1)


def test_progressive_decodes_identically_to_baseline():
    """Progressive (SOF2) and baseline encodings share ONE vectorized
    forward pass, so their coefficients are identical and the two decodes
    must match EXACTLY — any spectral-selection, EOB-run, or successive-
    approximation bug shows up as a pixel diff. Covers: plain spectral
    selection (successive=False), the full SA ladder (Al=1 firsts + DC/AC
    refinement scans), 4:2:0, grayscale, odd dims, dense (low quality) and
    sparse (long EOB run) coefficient populations."""
    from datastream_deltalake_connector_spark.functions.jpeg import encode_jpeg_np

    rng = np.random.default_rng(19)
    cases = []
    for h, w, c in [(16, 16, 3), (17, 23, 3), (8, 9, 3), (21, 19, 1)]:
        cases.append((_smooth_img(h, w, c=c), 92))
    cases.append((rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8), 40))
    cases.append((rng.integers(0, 256, size=(24, 31, 3)).astype(np.uint8), 85))
    sparse = np.zeros((48, 64, 3), np.uint8)
    sparse[10, 50], sparse[30, 5] = 255, 128
    cases.append((sparse, 95))
    for px, q in cases:
        subs = (False, True) if px.shape[2] == 3 else (False,)
        for sub in subs:
            base = decode_jpeg_np(encode_jpeg_np(px, quality=q, subsample=sub))
            for successive in (False, True):
                prog = decode_jpeg_np(
                    encode_jpeg_np(
                        px,
                        quality=q,
                        subsample=sub,
                        progressive=True,
                        successive=successive,
                    )
                )
                assert np.array_equal(base, prog), (px.shape, q, sub, successive)


def test_progressive_marker_and_quality():
    """The progressive stream really is SOF2 (a naive baseline-only reader
    must not mistake it) and reconstructs the source above the 40 dB bar."""
    from datastream_deltalake_connector_spark.functions.jpeg import (
        encode_jpeg_np,
        jpeg_dims,
    )

    px = _smooth_img(26, 34)
    data = encode_jpeg_np(px, quality=95, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") >= 6  # DC + split AC scans + refinements
    assert jpeg_dims(data) == (34, 26, 3)
    assert psnr_np(px, decode_jpeg_np(data)) >= 40


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any marker may be preceded by extra 0xFF fill bytes —
    real encoders/cameras emit them. Both the full decoder and the
    header-only dims probe must skip the padding run."""
    from datastream_deltalake_connector_spark.functions.jpeg import jpeg_dims

    px = _smooth_img(16, 16)
    clean = _make_jpeg(px, quality=95)
    ref = decode_jpeg_np(clean)
    # pad after SOI (before APP0/DQT) and again before the SOS marker
    padded = clean[:2] + b"\xff\xff\xff" + clean[2:]
    sos = padded.index(b"\xff\xda")
    padded = padded[:sos] + b"\xff" + padded[sos:]
    assert np.array_equal(decode_jpeg_np(padded), ref)
    assert jpeg_dims(padded) == jpeg_dims(clean)


def test_jpeg_dims_truncated_fill_run_raises_valueerror():
    """ADVICE r4: a truncated stream ending in an 0xFF fill run must raise
    the module's ValueError, not struct.error/IndexError from reading past
    the buffer after the fill-skip loop."""
    from datastream_deltalake_connector_spark.functions.jpeg import jpeg_dims

    # SOI followed only by fill bytes — the run reaches end-of-stream
    with pytest.raises(ValueError):
        jpeg_dims(b"\xff\xd8" + b"\xff" * 6)
    # a real stream chopped so the final bytes are an 0xFF run before what
    # would have been a marker + length
    px = _smooth_img(16, 16)
    clean = _make_jpeg(px, quality=95)
    with pytest.raises(ValueError):
        jpeg_dims(clean[:4] + b"\xff\xff")
    # chopped mid-SOF (marker present, payload missing)
    with pytest.raises(ValueError):
        jpeg_dims(clean[: clean.index(b"\xff\xc0") + 3])

"""REAL ICO (Windows icon) codec — a container walk composed over the
engine's own BMP and PNG decoders.

Web crawls are full of favicon.ico bytes. The container is an ICONDIR of
sized entries; each image is either a full PNG stream or a "BMP without
BITMAPFILEHEADER" whose DIB height is DOUBLED (XOR color rows followed by a
1-bit AND transparency mask, both bottom-up and 4-byte padded).

- ``decode_ico_np``: picks the largest entry (0 in the size byte means
  256), dispatches PNG entries to ``decode_png_np``; DIB entries get a
  synthesized BITMAPFILEHEADER + un-doubled height and ride
  ``decode_bmp_np``, then the AND mask folds in as alpha (skipped for
  32-bpp entries that already carry real alpha).
- ``encode_ico_np``: single-image writer (PNG-compressed entry, the
  modern form every reader accepts), used by tests/fixtures.
- ``ico_info``: entry table probe without decoding pixels.
"""

from __future__ import annotations

import struct

import numpy as np

from .bmp import decode_bmp_np
from .image import PNG_SIGNATURE, decode_png_np, encode_png_np

__all__ = ["decode_ico_np", "encode_ico_np", "ico_info"]


def _entries(data: bytes) -> list[dict]:
    if len(data) < 6:
        raise ValueError("not an ICO stream")
    reserved, kind, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or kind not in (1, 2) or count == 0:
        raise ValueError("not an ICO stream")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICONDIR")
        w, h, _colors, _res, planes, bpp, size, img_off = struct.unpack_from(
            "<BBBBHHII", data, off
        )
        out.append(
            {
                "width": w or 256,
                "height": h or 256,
                "bpp": bpp,
                "bytes": size,
                "offset": img_off,
                "cursor": kind == 2,
            }
        )
    return out


def ico_info(data: bytes) -> dict:
    es = _entries(data)
    best = max(es, key=lambda e: e["width"] * e["height"])
    return {"n_images": len(es), "width": best["width"], "height": best["height"]}


def decode_ico_np(data: bytes) -> np.ndarray:
    """Decode the largest image in the container → (h, w, 3|4) uint8."""
    e = max(_entries(data), key=lambda x: x["width"] * x["height"])
    blob = data[e["offset"] : e["offset"] + e["bytes"]]
    if blob[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
        return decode_png_np(blob)
    # DIB entry: biHeight counts XOR + AND rows; un-double it and wrap in a
    # synthesized file header so the BMP decoder does the heavy lifting
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB entry")
    (hdr_size,) = struct.unpack_from("<I", blob, 0)
    w, h2, planes, bpp, comp = struct.unpack_from("<iihHI", blob, 4)
    if comp != 0:
        raise NotImplementedError(f"ICO DIB compression {comp}")
    h = abs(h2) // 2
    dib = bytearray(blob)
    struct.pack_into("<i", dib, 8, h if h2 > 0 else -h)
    pal_n = 0
    if bpp <= 8:
        (colors_used,) = struct.unpack_from("<I", blob, 32)
        pal_n = colors_used or (1 << bpp)
    data_off = 14 + hdr_size + pal_n * 4
    bmp = (
        struct.pack("<2sIHHI", b"BM", 14 + len(dib), 0, 0, data_off)
        + bytes(dib)
    )
    px = decode_bmp_np(bmp)
    if px.shape[2] == 4:  # 32-bpp alpha already folded in by the decoder
        return px
    # AND mask: 1-bit bottom-up rows after the XOR pixel array
    xor_stride = ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    mask_off = hdr_size + pal_n * 4 + xor_stride * h
    need = and_stride * h
    if len(blob) < mask_off + need:
        return px  # mask absent/truncated: opaque image
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=need, offset=mask_off
    ).reshape(h, and_stride)
    if h2 > 0:
        rows = rows[::-1]
    mask = np.unpackbits(rows, axis=1)[:, :w]
    alpha = np.where(mask == 1, 0, 255).astype(np.uint8)
    if not (alpha == 255).all():
        return np.dstack([px, alpha])
    return px


def encode_ico_np(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → single-entry PNG-compressed ICO."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode expects (h, w, 3) RGB")
    h, w, _ = px.shape
    if w > 256 or h > 256:
        raise ValueError("ICO images are at most 256x256")
    payload = encode_png_np(px)
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(payload), 6 + 16
    )
    return struct.pack("<HHH", 0, 1, 1) + entry + payload

"""REAL Netpbm (PGM/PPM) codec — pure stdlib + numpy.

Research image corpora (classic CV datasets, scanner pipelines) still ship
plain Netpbm files. The format is trivial but the tokenizer rules are not:
whitespace-separated header tokens with ``#`` comments allowed anywhere in
the header, then either ASCII sample tokens (P2/P3) or a raw sample block
(P5/P6) starting after EXACTLY ONE whitespace byte.

- ``decode_netpbm_np``: P2 (ASCII gray), P3 (ASCII RGB), P5 (raw gray),
  P6 (raw RGB); maxval 1..65535 (16-bit raw samples are big-endian per
  spec, scaled to 8-bit) → (h, w, 3) uint8 RGB.
- ``encode_netpbm_np``: P5/P6 writer (maxval 255), plus P2/P3 for fixtures.
- ``netpbm_info``: header probe without touching samples.

P1/P4 bitmap variants raise ``NotImplementedError`` honestly.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["decode_netpbm_np", "encode_netpbm_np", "netpbm_info"]

_MAGICS = {b"P2": ("gray", False), b"P3": ("rgb", False),
           b"P5": ("gray", True), b"P6": ("rgb", True)}


def _header_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Read n integer tokens after the magic, skipping whitespace and
    ``#``-to-EOL comments; returns (tokens, offset just past the single
    whitespace byte that terminates the header)."""
    toks: list[int] = []
    pos = 2
    while len(toks) < n:
        if pos >= len(data):
            raise ValueError("truncated Netpbm header")
        c = data[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
            continue
        if c == b"#":
            nl = data.find(b"\n", pos)
            pos = (nl + 1) if nl != -1 else len(data)
            continue
        m = re.match(rb"\d+", data[pos:])
        if not m:
            raise ValueError(f"bad Netpbm header token at {pos}")
        toks.append(int(m.group(0)))
        pos += m.end()
    # exactly one whitespace byte separates the header from raw samples
    if pos < len(data) and data[pos : pos + 1] in b" \t\r\n":
        pos += 1
    return toks, pos


def netpbm_info(data: bytes) -> dict:
    magic = data[:2]
    if magic in (b"P1", b"P4"):
        raise NotImplementedError("Netpbm bitmap (P1/P4) not supported")
    if magic not in _MAGICS:
        raise ValueError("not a Netpbm stream")
    kind, raw = _MAGICS[magic]
    (w, h, maxval), pos = _header_tokens(data, 3)
    return {"width": w, "height": h, "maxval": maxval,
            "channels": 3 if kind == "rgb" else 1, "raw": raw,
            "sample_offset": pos}


def decode_netpbm_np(data: bytes) -> np.ndarray:
    info = netpbm_info(data)  # one header pass; offset rides along
    w, h, maxval = info["width"], info["height"], info["maxval"]
    ch = info["channels"]
    if not (0 < maxval < 65536):
        raise ValueError(f"Netpbm maxval {maxval}")
    pos = info["sample_offset"]
    n = w * h * ch
    if info["raw"]:
        if maxval > 255:  # 16-bit raw samples are big-endian
            need = n * 2
            if len(data) - pos < need:
                raise ValueError("truncated Netpbm sample block")
            x = np.frombuffer(data, dtype=">u2", count=n, offset=pos)
        else:
            if len(data) - pos < n:
                raise ValueError("truncated Netpbm sample block")
            x = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    else:
        # ASCII samples: strip comments, one split + one array build
        body = re.sub(rb"#[^\n]*", b" ", data[pos:])
        x = np.array(body.split()[:n], dtype=np.int64)
        if x.size < n:
            raise ValueError(f"Netpbm ASCII samples short: {x.size}/{n}")
        if (x > maxval).any() or (x < 0).any():
            raise ValueError("Netpbm ASCII sample out of range")
    if maxval != 255:  # scale to full 8-bit, round-half-up like the spec
        x = (x.astype(np.uint32) * 255 + maxval // 2) // maxval
    px = x.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px


def encode_netpbm_np(
    pixels: np.ndarray, ascii_mode: bool = False, maxval: int = 255
) -> bytes:
    """(h, w) gray → PGM (P5/P2); (h, w, 3) RGB → PPM (P6/P3)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode expects (h, w) gray or (h, w, 3) RGB")
    if maxval != 255:
        raise ValueError("writer emits maxval 255")
    h, w = px.shape[:2]
    magic = (b"P2" if gray else b"P3") if ascii_mode else (b"P5" if gray else b"P6")
    header = b"%s\n# engine fixture\n%d %d\n255\n" % (magic, w, h)
    if not ascii_mode:
        return header + px.tobytes()
    flat = px.reshape(h, -1)
    body = b"\n".join(b" ".join(b"%d" % v for v in row) for row in flat)
    return header + body + b"\n"

"""REAL GIF codec — pure stdlib + numpy, from scratch.

Animated GIF is the one genuinely decodable *video-like* container that
needs no external codec library: palette frames + LZW (a dictionary coder,
implementable exactly from the GIF89a specification). This gives the
multimodal surface real frame-sampling bytes, the same way functions/image
(PNG) and functions/jpeg give it real image bytes. The reference connector
is payload-agnostic about what lands in GCS (`DatastreamIO.scala:90-95`);
an engine claiming frame extraction must parse a real bitstream.

- ``decode_gif_np``: header + logical screen descriptor, global/local color
  tables, interlacing, Graphic Control Extensions (transparency index,
  disposal methods 0-3 incl. restore-to-background and restore-to-previous),
  LZW decompression (LSB-first variable-width codes, clear/EOI, 12-bit cap)
  → (n_frames, h, w, 3) uint8 composed frames + per-frame delays.
- ``encode_gif_np``: exact-palette writer (≤256 unique colors across all
  frames — deterministic pipeline fixtures satisfy this; lossy palette
  quantization of arbitrary photos is out of scope and raises), spec
  LZW compressor with dictionary reset at 4096, optional per-frame delays
  and interlacing, NETSCAPE2.0 loop block.

LZW inner loops run per *code*, not per pixel (codes amortize runs), and
palette application / interlace reordering / frame composition are numpy.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif_np", "encode_gif_np", "gif_info"]

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


# ----------------------------------------------------------------- LZW core
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavored LZW: LSB-first bitstream, variable code width starting at
    min_code_size+1, dictionary grows to 4096 then freezes until CLEAR.
    Hot-loop posture: an int accumulator feeds codes (no per-bit work), and
    decoded entries are joined ONCE at the end (no per-code numpy calls)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    parts: list[bytes] = []
    n_out = 0
    acc = 0
    nbits = 0
    bpos = 0
    total = len(data)

    def reset_table() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        while nbits < width:
            if bpos >= total:
                break
            acc |= data[bpos] << nbits
            bpos += 1
            nbits += 8
        if nbits < width:
            break  # stream exhausted mid-code
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond table")
        parts.append(entry)
        n_out += len(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise ValueError(f"LZW stream ended early: {n_out}/{n_pixels} pixels")
    return np.frombuffer(b"".join(parts), dtype=np.uint8)[:n_pixels]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Spec LZW compressor: emits CLEAR up front and on dictionary overflow
    (4096), EOI at the end; LSB-first variable-width packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_codes: list[tuple[int, int]] = []  # (code, width)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    out_codes.append((clear, width))
    buf = indices.astype(np.uint8).tobytes()
    prev = b""
    for i in range(len(buf)):
        cur = prev + buf[i : i + 1]
        if cur in table:
            prev = cur
            continue
        out_codes.append((table[prev], width))
        if next_code < 4096:  # 12-bit ceiling: 4095 is the largest code
            table[cur] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            out_codes.append((clear, width))
            table, next_code, width = fresh()
        prev = buf[i : i + 1]
    if prev:
        out_codes.append((table[prev], width))
    out_codes.append((eoi, width))

    # pack LSB-first
    acc = 0
    acc_bits = 0
    chunks = bytearray()
    for code, w in out_codes:
        acc |= code << acc_bits
        acc_bits += w
        while acc_bits >= 8:
            chunks.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8
    if acc_bits:
        chunks.append(acc & 0xFF)
    return bytes(chunks)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> np.ndarray:
    order = np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])
    inv = np.empty(h, dtype=np.int64)
    inv[order] = np.arange(h)
    return inv


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    table = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
    return table, pos + 3 * n


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            break
        parts.append(data[pos : pos + size])
        pos += size
    return b"".join(parts), pos


def gif_info(data: bytes) -> dict:
    """Header probe: canvas dims + frame count without composing pixels."""
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _read_subblocks(data, pos)
        elif block == 0x2C:
            _l, _t, _fw, _fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size
            _, pos = _read_subblocks(data, pos)
            frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return {"w": int(w), "h": int(h), "n_frames": frames}


def decode_gif_np(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode all frames → ((n, h, w, 3) uint8 composed RGB, delays in cs)."""
    if data[:6] not in GIF_SIGNATURES:
        raise ValueError("not a GIF stream")
    w, h, packed, bg_index, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg_fill = canvas[0, 0].copy() if gct is not None else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            raw, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(raw) >= 4:  # Graphic Control Extension
                gpacked, delay = struct.unpack_from("<BH", raw, 0)
                disposal = (gpacked >> 2) & 0x07
                transparent = raw[3] if gpacked & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(data, pos, 2 << (ipacked & 0x07))
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame without any color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, min_code_size, fw * fh).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced
            idx = idx[_deinterlace_rows(fh)]

        saved = canvas[top : top + fh, left : left + fw].copy()
        rgb = palette[np.minimum(idx, len(palette) - 1)]
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(int(delay))

        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = bg_fill
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = saved
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise ValueError("GIF stream contains no image frames")
    return np.stack(frames), delays


def encode_gif_np(
    frames: np.ndarray,
    delays_cs: list[int] | int = 4,
    loop: bool = True,
    interlace: bool = False,
) -> bytes:
    """Encode (n, h, w, 3) or (h, w, 3) uint8 RGB as GIF89a. All frames must
    share ≤256 unique colors (exact palette — deterministic fixtures do;
    photographic palette quantization is out of scope here and raises)."""
    px = np.asarray(frames)
    if px.ndim == 3:
        px = px[None]
    if px.dtype != np.uint8 or px.ndim != 4 or px.shape[-1] != 3:
        raise ValueError("encode_gif_np expects (n, h, w, 3) uint8 RGB")
    n, h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} unique colors; exact-palette GIF needs <= 256 "
            "(quantize upstream)"
        )
    # pad palette to a power of two ≥ 2
    size_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    padded = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    padded[: len(palette)] = palette
    indices = inverse.reshape(n, h, w).astype(np.uint8)
    min_code_size = max(2, size_bits)

    if isinstance(delays_cs, int):
        delays_cs = [delays_cs] * n

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((size_bits - 1) & 0x07), 0, 0)
    out += padded.tobytes()
    if loop and n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i in range(n):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delays_cs[i], 0) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = indices[i]
        if interlace:
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            idx = idx[order]
        out.append(min_code_size)
        lzw = _lzw_encode(idx.reshape(-1), min_code_size)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)

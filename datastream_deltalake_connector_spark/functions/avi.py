"""REAL AVI (RIFF) container codec for MJPEG video — pure stdlib ``struct``.

Motion-JPEG-in-AVI is the simplest real-world video container this engine
can decode honestly end-to-end: the RIFF chunk grammar is the same one the
WAV parser walks (functions/audio.py), and every frame payload is a baseline
JFIF stream the from-scratch JPEG codec (functions/jpeg.py) already decodes.
Layout follows the public AVI RIFF form (Microsoft "AVI RIFF File Reference"
/ OpenDML): ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' 00dc...) idx1)``. H.264/VP9 containers (MP4/WebM) remain
honestly gated in functions/multimodal.py — their entropy coding is not
reimplementable here — but MJPEG-AVI is a format real capture pipelines
emit, so ``sample_video_frames`` gains a genuine real-bytes path.

Reference-parity note: the reference connector (badal-io/
datastream-deltalake-connector) has no video surface; this module belongs
to the engine's multimodal additions (SURVEY.md §2.9), mirroring the GIF
path's design: container walk here, pixel decode in the image codecs.
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi_mjpeg", "decode_avi_frames", "avi_info"]

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk with the spec's even-byte padding (pad byte excluded from
    the declared size, exactly like WAV data chunks)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], w: int, h: int, fps: int = 25
) -> bytes:
    """Wrap pre-encoded baseline-JPEG frames as a standards-shaped
    MJPEG AVI: avih + one 'vids'/'MJPG' stream (strh/strf with a
    BITMAPINFOHEADER), '00dc' movi records, and an idx1 keyframe index
    (every MJPEG frame is a keyframe)."""
    if not jpeg_frames:
        raise ValueError("cannot encode an empty AVI")
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,
        max_bytes * fps,  # dwMaxBytesPerSec (advisory)
        0,  # padding granularity
        _AVIF_HASINDEX,
        len(jpeg_frames),
        0,  # initial frames
        1,  # streams
        max_bytes,  # suggested buffer
        w,
        h,
        0,
        0,
        0,
        0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4s10I4H",
        b"vids",
        b"MJPG",
        0,  # flags
        0,  # priority+language packed (both 0)
        0,  # initial frames
        1,  # scale
        fps,  # rate: rate/scale = fps
        0,  # start
        len(jpeg_frames),
        max_bytes,
        0xFFFFFFFF,  # quality: default
        0,  # sample size: varies per frame
        0,
        0,
        w,
        h,  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H4s5I",
        40,  # biSize
        w,
        h,
        1,  # planes
        24,  # bit count
        b"MJPG",
        w * h * 3,  # biSizeImage (advisory for compressed)
        0,
        0,
        0,
        0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_records = [_chunk(b"00dc", f) for f in jpeg_frames]
    movi = _list(b"movi", b"".join(movi_records))
    # idx1 offsets are relative to the start of the 'movi' list type fourcc
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for f, rec in zip(jpeg_frames, movi_records):
        idx_entries.append(
            struct.pack("<4s3I", b"00dc", _AVIIF_KEYFRAME, off, len(f))
        )
        off += len(rec)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [pos, end); tolerates the spec's odd-size pad byte."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise ValueError("truncated AVI chunk")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def avi_info(data: bytes) -> dict:
    """Parse the avih main header: {n_frames, w, h, us_per_frame, streams}."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_end = 8 + struct.unpack_from("<I", data, 4)[0]
    if riff_end > len(data):
        raise ValueError("truncated AVI stream")
    for fourcc, start, size in _walk(data, 12, riff_end):
        if fourcc == b"LIST" and data[start : start + 4] == b"hdrl":
            for cc2, s2, z2 in _walk(data, start + 4, start + size):
                if cc2 == b"avih":
                    v = struct.unpack_from("<14I", data, s2)
                    return {
                        "us_per_frame": v[0],
                        "n_frames": v[4],
                        "streams": v[6],
                        "w": v[8],
                        "h": v[9],
                    }
    raise ValueError("AVI missing avih header")


def decode_avi_frames(data: bytes) -> tuple[list[bytes], int, int]:
    """Walk the movi list and return (per-frame JPEG payloads, w, h).

    Accepts '00dc'/'00db' records (compressed/uncompressed fourcc spellings
    both carry JPEG under MJPG) and skips 'rec ' grouping lists and any
    non-frame records (e.g. interleaved audio '01wb') — the tolerant-walk
    posture of the WAV parser. Frame pixel decode is the caller's job
    (functions/jpeg.py), keeping container and codec independent."""
    info = avi_info(data)  # validates RIFF/AVI framing
    riff_end = 8 + struct.unpack_from("<I", data, 4)[0]
    frames: list[bytes] = []

    def collect(pos: int, end: int) -> None:
        for fourcc, start, size in _walk(data, pos, end):
            if fourcc == b"LIST" and data[start : start + 4] == b"rec ":
                collect(start + 4, start + size)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(bytes(data[start : start + size]))

    for fourcc, start, size in _walk(data, 12, riff_end):
        if fourcc == b"LIST" and data[start : start + 4] == b"movi":
            collect(start + 4, start + size)
    if not frames:
        raise ValueError("AVI contains no video frame records")
    return frames, info["w"], info["h"]

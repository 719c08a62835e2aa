"""EXIF metadata: from-scratch TIFF-IFD parser + writer for the JPEG APP1
segment, stdlib-only (public specs: EXIF 2.32 = CIPA DC-008, TIFF 6.0).

The reference connector moves image rows whose payloads at web scale are
overwhelmingly camera/phone JPEGs; orientation, capture time, and camera
fields are the metadata a 100-TB training-data pipeline filters and
normalizes on BEFORE paying for pixel decode (EXIF lives in the first few
KB — a header-range read, like ``jpeg_dims``). The parser walks the real
byte layout: APP1 marker scan → "Exif\\0\\0" → TIFF header (II/MM byte
order, magic 42) → IFD0 → Exif/GPS sub-IFD pointers, honoring out-of-line
value areas and bounds-checking every offset (corrupt EXIF returns partial
fields, never throws — web-crawled EXIF is routinely truncated).

The writer emits a spec-compliant APP1 from the same field set (both byte
orders), which is how the fixtures for the oracled ``image_exif`` query and
the round-trip tests are built — parser and writer are independent enough
that agreement pins both (the writer lays out IFDs/data areas forward; the
parser follows offsets wherever they point).

``apply_orientation_np`` maps EXIF orientation 1-8 onto numpy views
(zero-copy flips/transposes) — the normalize step before pixels enter a
training set.
"""

from __future__ import annotations

import struct

__all__ = [
    "extract_exif",
    "parse_exif_app1",
    "build_exif_app1",
    "insert_exif",
    "apply_orientation_np",
    "EXIF_FIELDS",
]

# output field order (also the Spark struct column order)
EXIF_FIELDS = [
    "make",
    "model",
    "orientation",
    "datetime_original",
    "pixel_x",
    "pixel_y",
    "exposure_time",
    "f_number",
    "iso",
    "gps_lat",
    "gps_lon",
]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# IFD0 tags
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
# Exif IFD tags
_TAG_EXPOSURE = 0x829A
_TAG_FNUMBER = 0x829D
_TAG_ISO = 0x8827
_TAG_DATETIME_ORIG = 0x9003
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003
# GPS IFD tags
_TAG_GPS_LAT_REF = 0x0001
_TAG_GPS_LAT = 0x0002
_TAG_GPS_LON_REF = 0x0003
_TAG_GPS_LON = 0x0004


def _read_ifd(buf: bytes, off: int, e: str) -> dict[int, tuple[int, int, bytes]]:
    """One IFD as {tag: (type, count, raw_value_bytes)} — raw bytes are the
    actual value area (inline or followed out-of-line), bounds-checked."""
    out: dict[int, tuple[int, int, bytes]] = {}
    if off < 0 or off + 2 > len(buf):
        return out
    (n,) = struct.unpack_from(e + "H", buf, off)
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(buf):
            break
        tag, typ, count = struct.unpack_from(e + "HHI", buf, pos)
        size = _TYPE_SIZES.get(typ, 0) * count
        if size == 0:
            pos += 12
            continue
        if size <= 4:
            raw = buf[pos + 8 : pos + 8 + size]
        else:
            (voff,) = struct.unpack_from(e + "I", buf, pos + 8)
            if voff + size > len(buf):
                pos += 12
                continue
            raw = buf[voff : voff + size]
        out[tag] = (typ, count, raw)
        pos += 12
    return out


def _ascii(v: tuple[int, int, bytes] | None) -> str | None:
    if v is None or v[0] != 2:
        return None
    return v[2].split(b"\x00", 1)[0].decode("ascii", errors="replace") or None


def _uint(v: tuple[int, int, bytes] | None, e: str) -> int | None:
    if v is None:
        return None
    typ, _count, raw = v
    if typ == 3 and len(raw) >= 2:
        return struct.unpack_from(e + "H", raw)[0]
    if typ == 4 and len(raw) >= 4:
        return struct.unpack_from(e + "I", raw)[0]
    return None


def _rational(v: tuple[int, int, bytes] | None, e: str, idx: int = 0) -> float | None:
    if v is None or v[0] not in (5, 10) or len(v[2]) < 8 * (idx + 1):
        return None
    fmt = e + ("II" if v[0] == 5 else "ii")
    num, den = struct.unpack_from(fmt, v[2], 8 * idx)
    if den == 0:
        return None
    return num / den


def _gps_degrees(
    coord: tuple[int, int, bytes] | None,
    ref: tuple[int, int, bytes] | None,
    e: str,
    neg_refs: tuple[str, str] = ("S", "W"),
) -> float | None:
    d = _rational(coord, e, 0)
    m = _rational(coord, e, 1)
    s = _rational(coord, e, 2)
    if d is None:
        return None
    # identical IEEE expression order to the SQL oracle: d + m/60 + s/3600
    val = d + (m or 0.0) / 60 + (s or 0.0) / 3600
    r = _ascii(ref)
    return -val if r in neg_refs else val


def parse_exif_app1(payload: bytes) -> dict:
    """Parse the APP1 payload (starting at "Exif\\0\\0") into the
    EXIF_FIELDS dict; missing/corrupt fields come back None."""
    out: dict = {k: None for k in EXIF_FIELDS}
    if payload[:6] != b"Exif\x00\x00":
        return out
    tiff = payload[6:]
    if len(tiff) < 8:
        return out
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        return out
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        return out
    ifd0 = _read_ifd(tiff, ifd0_off, e)
    out["make"] = _ascii(ifd0.get(_TAG_MAKE))
    out["model"] = _ascii(ifd0.get(_TAG_MODEL))
    out["orientation"] = _uint(ifd0.get(_TAG_ORIENTATION), e)
    exif_off = _uint(ifd0.get(_TAG_EXIF_IFD), e)
    if exif_off is not None:
        sub = _read_ifd(tiff, exif_off, e)
        out["datetime_original"] = _ascii(sub.get(_TAG_DATETIME_ORIG))
        out["pixel_x"] = _uint(sub.get(_TAG_PIXEL_X), e)
        out["pixel_y"] = _uint(sub.get(_TAG_PIXEL_Y), e)
        out["exposure_time"] = _rational(sub.get(_TAG_EXPOSURE), e)
        out["f_number"] = _rational(sub.get(_TAG_FNUMBER), e)
        out["iso"] = _uint(sub.get(_TAG_ISO), e)
    gps_off = _uint(ifd0.get(_TAG_GPS_IFD), e)
    if gps_off is not None:
        gps = _read_ifd(tiff, gps_off, e)
        out["gps_lat"] = _gps_degrees(
            gps.get(_TAG_GPS_LAT), gps.get(_TAG_GPS_LAT_REF), e, ("S", "s")
        )
        out["gps_lon"] = _gps_degrees(
            gps.get(_TAG_GPS_LON), gps.get(_TAG_GPS_LON_REF), e, ("W", "w")
        )
    return out


def extract_exif(data: bytes) -> dict:
    """EXIF fields from a JPEG stream: walk the marker sequence up to SOS
    (EXIF APP1 precedes entropy data by spec — T.81 B.2.4 allows APPn only
    in the tables/misc section) and parse the first "Exif" APP1. Non-JPEG
    or EXIF-less input yields all-None. Header-range only: never touches
    entropy-coded bytes, so at 100 TB this reads the first KBs per object."""
    out = {k: None for k in EXIF_FIELDS}
    if data[:2] != b"\xff\xd8":
        return out
    pos = 2
    while pos + 4 <= len(data):
        while pos + 1 < len(data) and data[pos] == 0xFF and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker (T.81 B.1.1.2)
        # re-check after the fill skip: a stream ending in an 0xFF run must
        # not over-read (the jpeg_dims lesson, ADVICE r4)
        if pos + 4 > len(data) or data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no APP1 follows
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if marker == 0xE1:
            payload = data[pos + 4 : pos + 2 + seg_len]
            if payload[:6] == b"Exif\x00\x00":
                return parse_exif_app1(payload)
        pos += 2 + seg_len
    return out


def _enc_ascii(s: str) -> tuple[int, int, bytes]:
    raw = s.encode("ascii") + b"\x00"
    return 2, len(raw), raw


def _enc_rationals(e: str, pairs: list[tuple[int, int]]) -> tuple[int, int, bytes]:
    raw = b"".join(struct.pack(e + "II", n, d) for n, d in pairs)
    return 5, len(pairs), raw


def _render_ifd(
    e: str, entries: list[tuple[int, int, int, bytes]], ifd_off: int
) -> bytes:
    """Render one IFD at ``ifd_off`` (offsets relative to the TIFF header):
    12-byte entries sorted by tag (TIFF 6.0 requirement), out-of-line
    values packed directly after the next-IFD pointer."""
    entries = sorted(entries)
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    head = struct.pack(e + "H", len(entries))
    tail = b""
    for tag, typ, count, raw in entries:
        head += struct.pack(e + "HHI", tag, typ, count)
        if len(raw) <= 4:
            head += raw.ljust(4, b"\x00")
        else:
            head += struct.pack(e + "I", data_off + len(tail))
            tail += raw
    return head + struct.pack(e + "I", 0) + tail


def _ifd_size(entries: list) -> int:
    return 2 + 12 * len(entries) + 4 + sum(
        len(raw) for _, _, _, raw in entries if len(raw) > 4
    )


def build_exif_app1(fields: dict, byte_order: str = "II") -> bytes:
    """Spec-compliant APP1 payload ("Exif\\0\\0" + TIFF) from an
    EXIF_FIELDS-style dict. ``exposure_time``/``f_number`` take (num, den)
    tuples; ``gps_lat``/``gps_lon`` take (deg, min, sec_num, sec_den)
    tuples plus ``gps_lat_ref``/``gps_lon_ref`` letters."""
    e = "<" if byte_order == "II" else ">"

    def E(tag, enc):
        typ, count, raw = enc
        return (tag, typ, count, raw)

    exif_entries = []
    if fields.get("exposure_time") is not None:
        exif_entries.append(E(_TAG_EXPOSURE, _enc_rationals(e, [fields["exposure_time"]])))
    if fields.get("f_number") is not None:
        exif_entries.append(E(_TAG_FNUMBER, _enc_rationals(e, [fields["f_number"]])))
    if fields.get("iso") is not None:
        exif_entries.append((_TAG_ISO, 3, 1, struct.pack(e + "H", fields["iso"])))
    if fields.get("datetime_original") is not None:
        exif_entries.append(E(_TAG_DATETIME_ORIG, _enc_ascii(fields["datetime_original"])))
    if fields.get("pixel_x") is not None:
        exif_entries.append((_TAG_PIXEL_X, 4, 1, struct.pack(e + "I", fields["pixel_x"])))
    if fields.get("pixel_y") is not None:
        exif_entries.append((_TAG_PIXEL_Y, 4, 1, struct.pack(e + "I", fields["pixel_y"])))

    gps_entries = []
    if fields.get("gps_lat") is not None:
        d, m, sn, sd = fields["gps_lat"]
        gps_entries.append(E(_TAG_GPS_LAT_REF, _enc_ascii(fields.get("gps_lat_ref", "N"))))
        gps_entries.append(E(_TAG_GPS_LAT, _enc_rationals(e, [(d, 1), (m, 1), (sn, sd)])))
    if fields.get("gps_lon") is not None:
        d, m, sn, sd = fields["gps_lon"]
        gps_entries.append(E(_TAG_GPS_LON_REF, _enc_ascii(fields.get("gps_lon_ref", "E"))))
        gps_entries.append(E(_TAG_GPS_LON, _enc_rationals(e, [(d, 1), (m, 1), (sn, sd)])))

    ifd0_entries = []
    if fields.get("make") is not None:
        ifd0_entries.append(E(_TAG_MAKE, _enc_ascii(fields["make"])))
    if fields.get("model") is not None:
        ifd0_entries.append(E(_TAG_MODEL, _enc_ascii(fields["model"])))
    if fields.get("orientation") is not None:
        ifd0_entries.append(
            (_TAG_ORIENTATION, 3, 1, struct.pack(e + "H", fields["orientation"]))
        )
    # sub-IFD pointers: offsets known once IFD0's own size is fixed
    n_pointers = (1 if exif_entries else 0) + (1 if gps_entries else 0)
    ifd0_size = _ifd_size(ifd0_entries) + 12 * n_pointers
    exif_off = 8 + ifd0_size
    gps_off = exif_off + (_ifd_size(exif_entries) if exif_entries else 0)
    if exif_entries:
        ifd0_entries.append((_TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", exif_off)))
    if gps_entries:
        ifd0_entries.append((_TAG_GPS_IFD, 4, 1, struct.pack(e + "I", gps_off)))

    tiff = (
        (b"II" if e == "<" else b"MM")
        + struct.pack(e + "HI", 42, 8)
        + _render_ifd(e, ifd0_entries, 8)
    )
    if exif_entries:
        tiff += _render_ifd(e, exif_entries, exif_off)
    if gps_entries:
        tiff += _render_ifd(e, gps_entries, gps_off)
    return b"Exif\x00\x00" + tiff


def insert_exif(jpeg: bytes, fields: dict, byte_order: str = "II") -> bytes:
    """Insert an EXIF APP1 right after SOI (EXIF 2.32 puts APP1 first)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    payload = build_exif_app1(fields, byte_order)
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("EXIF payload exceeds APP1 segment capacity")
    return (
        jpeg[:2]
        + b"\xff\xe1"
        + struct.pack(">H", len(payload) + 2)
        + payload
        + jpeg[2:]
    )


def apply_orientation_np(img, orientation: int | None):
    """Normalize pixels per EXIF orientation 1-8 (zero-copy numpy views).
    Values follow the spec's row0/col0 table: 2=mirror-H, 3=rot180,
    4=mirror-V, 5=transpose, 6=rot90CW, 7=anti-transpose, 8=rot90CCW.
    Unknown/None → unchanged."""
    import numpy as np

    if orientation in (None, 1):
        return img
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1, :]
    if orientation == 5:
        return np.swapaxes(img, 0, 1)
    if orientation == 6:
        return np.rot90(img, k=-1)
    if orientation == 7:
        return np.swapaxes(img, 0, 1)[::-1, ::-1]
    if orientation == 8:
        return np.rot90(img, k=1)
    return img


def exif_udf():
    """Arrow-batched pandas UDF: binary JPEG column → EXIF struct (the
    EXIF_FIELDS columns). Built lazily so the byte-level parser above stays
    importable without pyspark/pandas (e.g. range-read sidecar jobs)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    schema = (
        "make string, model string, orientation int, datetime_original string, "
        "pixel_x int, pixel_y int, exposure_time double, f_number double, "
        "iso int, gps_lat double, gps_lon double"
    )

    def _exif(data):
        rows = [
            extract_exif(b) if b is not None else {k: None for k in EXIF_FIELDS}
            for b in data
        ]
        return pd.DataFrame(rows, columns=EXIF_FIELDS)

    # this module has `from __future__ import annotations`, which would turn
    # inline hints into strings pyspark cannot resolve against local names —
    # hand it real annotation objects instead
    _exif.__annotations__ = {"data": pd.Series, "return": pd.DataFrame}
    return pandas_udf(schema)(_exif)

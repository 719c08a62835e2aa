"""EXIF APP1 parser/writer (functions/exif.py): round-trip both byte
orders, real-JPEG integration (the APP1 must not break the from-scratch
decoder or the header probe), orientation normalization, and corrupt-input
tolerance (web-crawled EXIF is routinely truncated — partial fields, never
an exception)."""

from __future__ import annotations

import numpy as np
import pytest

from datastream_deltalake_connector_spark.functions.exif import (
    apply_orientation_np,
    build_exif_app1,
    extract_exif,
    insert_exif,
    parse_exif_app1,
)

FIELDS = {
    "make": "AcmeCorp",
    "model": "Shooter 9000",
    "orientation": 6,
    "datetime_original": "2024:03:01 12:34:56",
    "pixel_x": 4032,
    "pixel_y": 3024,
    "exposure_time": (1, 128),
    "f_number": (7, 2),
    "iso": 200,
    "gps_lat": (37, 46, 30, 1),
    "gps_lat_ref": "N",
    "gps_lon": (122, 25, 6, 1),
    "gps_lon_ref": "W",
}


def expected_parsed():
    return {
        "make": "AcmeCorp",
        "model": "Shooter 9000",
        "orientation": 6,
        "datetime_original": "2024:03:01 12:34:56",
        "pixel_x": 4032,
        "pixel_y": 3024,
        "exposure_time": 1 / 128,
        "f_number": 3.5,
        "iso": 200,
        "gps_lat": 37 + 46 / 60 + 30 / 3600,
        "gps_lon": -(122 + 25 / 60 + 6 / 3600),
    }


@pytest.mark.parametrize("order", ["II", "MM"])
def test_roundtrip_both_byte_orders(order):
    payload = build_exif_app1(FIELDS, byte_order=order)
    assert payload[:6] == b"Exif\x00\x00"
    assert parse_exif_app1(payload) == expected_parsed()


def test_insert_and_extract_from_real_jpeg():
    from datastream_deltalake_connector_spark.functions.image import decode_image_np
    from datastream_deltalake_connector_spark.functions.jpeg import (
        encode_jpeg_np,
        jpeg_dims,
    )

    y, x, c = np.meshgrid(np.arange(16), np.arange(24), np.arange(3), indexing="ij")
    px = (3 * y + 3 * x + 20 * c).astype(np.uint8)
    plain = encode_jpeg_np(px, quality=95)
    tagged = insert_exif(plain, FIELDS)
    # the APP1 must be transparent to the decoder and the header probe
    assert jpeg_dims(tagged)[:2] == (24, 16)
    np.testing.assert_array_equal(decode_image_np(tagged), decode_image_np(plain))
    assert extract_exif(tagged) == expected_parsed()
    # EXIF-less JPEG and non-JPEG: all-None, no throw
    assert all(v is None for v in extract_exif(plain).values())
    assert all(v is None for v in extract_exif(b"not a jpeg").values())


def test_partial_fields_and_corruption_tolerance():
    partial = build_exif_app1({"orientation": 3, "iso": 64})
    got = parse_exif_app1(partial)
    assert got["orientation"] == 3 and got["iso"] == 64
    assert got["make"] is None and got["gps_lat"] is None

    full = build_exif_app1(FIELDS)
    for cut in (0, 4, 7, 12, 20, len(full) // 2, len(full) - 3):
        parse_exif_app1(full[:cut])  # must not raise
    # truncated stream ending in an 0xFF fill run must not over-read
    extract_exif(b"\xff\xd8\xff\xff\xff")
    extract_exif(b"\xff\xd8\xff")
    # zero denominator rational → None, not ZeroDivisionError
    bad = dict(FIELDS, exposure_time=(1, 0))
    assert parse_exif_app1(build_exif_app1(bad))["exposure_time"] is None


def test_gps_sign_conventions():
    south_east = dict(
        FIELDS, gps_lat_ref="S", gps_lon_ref="E",
        gps_lat=(10, 30, 0, 1), gps_lon=(20, 0, 45, 1),
    )
    got = parse_exif_app1(build_exif_app1(south_east))
    assert got["gps_lat"] == -(10 + 30 / 60)
    assert got["gps_lon"] == 20 + 45 / 3600


def test_apply_orientation_shapes_and_involutions():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # 1-4 preserve (h, w); 5-8 swap to (w, h)
    for o, shape in [(1, (2, 3, 3)), (2, (2, 3, 3)), (3, (2, 3, 3)),
                     (4, (2, 3, 3)), (5, (3, 2, 3)), (6, (3, 2, 3)),
                     (7, (3, 2, 3)), (8, (3, 2, 3))]:
        assert apply_orientation_np(img, o).shape == shape
    # mirror/rot180/transpose are involutions
    for o in (2, 3, 4, 5, 7):
        np.testing.assert_array_equal(
            apply_orientation_np(apply_orientation_np(img, o), o), img
        )
    # rot90CW then rot90CCW is identity
    np.testing.assert_array_equal(
        apply_orientation_np(apply_orientation_np(img, 6), 8), img
    )
    # all 8 produce distinct pixel layouts on an asymmetric image
    outs = {apply_orientation_np(img, o).tobytes() for o in range(1, 9)}
    assert len(outs) == 8
    np.testing.assert_array_equal(apply_orientation_np(img, None), img)


def test_exif_is_header_range_read():
    """The parser must not need the entropy-coded body: truncating the
    stream right after the APP1 still yields every field (the 100-TB
    cost-model claim: EXIF extraction is a first-KBs range read)."""
    from datastream_deltalake_connector_spark.functions.jpeg import encode_jpeg_np

    px = np.zeros((16, 16, 3), dtype=np.uint8)
    tagged = insert_exif(encode_jpeg_np(px, quality=90), FIELDS)
    app1_end = 4 + int.from_bytes(tagged[4:6], "big")
    head_only = tagged[: app1_end + 2]
    assert extract_exif(head_only) == expected_parsed()

"""Pure-Python Snappy block-format codec for Avro OCF blocks.

Datastream's Avro dumps may use ``avro.codec: snappy``; the reference gets
snappy support from the Avro jar on the Spark classpath, while this engine's
OCF reader is pure Python (sources/avro.py) and the ``python-snappy`` binding
is not in the container. The snappy BLOCK format itself is small and public
(google/snappy format_description.txt), so the engine carries its own codec:

- :func:`decompress` implements the full format — varint preamble, literal
  runs, and all three copy element kinds (1/2/4-byte offsets) with
  overlapping-copy semantics (offset < length repeats the pattern).
- :func:`compress` emits a spec-compliant stream using LITERAL elements only
  (compression ratio 1.0 + framing overhead). Any conformant decoder — the
  C++ library, java-snappy inside an Avro jar, or :func:`decompress` —
  accepts it; the engine only writes avro for tests and exports, where
  determinism matters more than ratio (image payloads are incompressible
  anyway). If ``python-snappy`` IS importable, both functions delegate to it.

Avro's snappy codec (per the Avro spec) appends a 4-byte BIG-endian CRC32 of
the UNCOMPRESSED block data after the compressed bytes; that framing lives in
sources/avro.py — this module is the raw block format only.
"""

from __future__ import annotations

try:  # pragma: no cover - binding not in this container
    import snappy as _snappy  # type: ignore

    _HAVE_NATIVE = hasattr(_snappy, "decompress")
except ImportError:
    _HAVE_NATIVE = False

__all__ = ["compress", "decompress"]


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 varint → (value, next position)."""
    value, shift = 0, 0
    while True:
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7
        if shift > 35:
            raise ValueError("varint too long for a snappy length")


def _write_varint(out: bytearray, value: int) -> None:
    while value > 0x7F:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)


def decompress(data: bytes) -> bytes:
    """Decode one snappy block-format stream. Every corruption mode —
    truncated element, bad offset, length mismatch — raises ValueError."""
    if _HAVE_NATIVE:  # pragma: no cover - binding not in this container
        return _snappy.decompress(data)
    try:
        return _decompress(data)
    except IndexError as exc:  # element truncated mid-stream
        raise ValueError("truncated snappy block (corrupt)") from exc


def _decompress(data: bytes) -> bytes:
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = tag >> 2
            if length < 60:
                length += 1
            else:
                extra = length - 59  # 60..63 → 1..4 length bytes
                length = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset (len 4..11, 11-bit offset)
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte little-endian offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range (corrupt block)")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping copy: repeat the trailing pattern
            for i in range(length):
                out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(
            f"snappy length mismatch: preamble {expected}, decoded {len(out)}"
        )
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Encode ``data`` as a valid snappy stream of literal elements."""
    if _HAVE_NATIVE:  # pragma: no cover - binding not in this container
        return _snappy.compress(data)
    out = bytearray()
    _write_varint(out, len(data))
    pos, n = 0, len(data)
    while pos < n:
        chunk = min(n - pos, 1 << 16)
        if chunk <= 60:
            out.append((chunk - 1) << 2)
        else:  # tag 61: 2-byte little-endian (length - 1)
            out.append(61 << 2)
            out += (chunk - 1).to_bytes(2, "little")
        out += data[pos : pos + chunk]
        pos += chunk
    return bytes(out)

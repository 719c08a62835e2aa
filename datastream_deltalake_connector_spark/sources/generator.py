"""Deterministic synthetic image+caption tables and CDC change batches.

BASELINE.json input_hint fixes the table shape: ``(image_id string, bytes
binary, w int, h int, fmt string, caption string, phash long)``. No external
data: pixels are seeded numpy, captions come from a seeded vocabulary, and
the key space is shaped like the 10^12-image population it samples —
``image_id`` begins with a 2-hex prefix drawn from a Zipf distribution, so a
handful of prefixes are *hot* (the skew the north_rule requires the merge
path to handle explicitly).

Generation itself is distributed and deterministic: ``spark.range(n)`` is
the seed axis, ``mapInPandas`` turns each Arrow batch of indices into rows.
Row i is a pure function of (seed, i) — regenerating any partition yields
identical bytes, which is what makes lineage-based resume exact.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.image import encode_image_np, phash_np
from ..operators.merge import SEQ_META, TS_META

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

MERGED_IMAGE_SCHEMA = T.StructType(
    list(IMAGE_SCHEMA.fields)
    + [
        T.StructField(TS_META, T.TimestampType()),
        T.StructField(SEQ_META, T.LongType()),
    ]
)

CHANGE_SCHEMA = T.StructType(
    list(IMAGE_SCHEMA.fields)
    + [
        T.StructField("change_type", T.StringType()),
        T.StructField("is_deleted", T.BooleanType()),
        T.StructField("source_timestamp", T.TimestampType()),
        T.StructField("change_seq", T.LongType()),
    ]
)

_VOCAB = (
    "a the quiet bright crimson golden distant small vast frozen "
    "mountain river city forest harbor sky lantern bridge garden temple "
    "fox crane owl tiger whale dancer sailor painter monk traveler "
    "above beneath beside beyond during under over toward within near "
    "sleeps shines drifts glows waits sings turns rests burns fades"
).split()

# Zipf-ish weights over 256 two-hex prefixes: prefix '00' is ~350x hotter
# than the tail — the hot-key skew the salted merge path must absorb.
_PREFIX_WEIGHTS = 1.0 / np.arange(1, 257) ** 1.2
_PREFIX_WEIGHTS /= _PREFIX_WEIGHTS.sum()
_T0_US = np.datetime64("2024-01-01T00:00:00", "us")


def _rng_for(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed * 1_000_003 + i))


def _image_id(seed: int, i: int, rng: np.random.Generator) -> str:
    prefix_idx = rng.choice(256, p=_PREFIX_WEIGHTS)
    suffix = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:14]
    return f"{prefix_idx:02x}{suffix}"


def _pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Structured pixels (gradient + rectangles) so phash is non-degenerate."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(w - 1, 1) + yy * 128 // max(h - 1, 1)) % 256
    img = np.stack([base, np.roll(base, h // 3, 0), 255 - base], axis=2).astype(np.int16)
    for _ in range(int(rng.integers(2, 5))):
        y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        y1, x1 = y0 + int(rng.integers(2, h // 2)), x0 + int(rng.integers(2, w // 2))
        img[y0:y1, x0:x1] = rng.integers(0, 256, size=3)
    noise = rng.integers(-8, 9, size=img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(5, 12))
    return " ".join(_VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), n))


def _id_of(seed: int, i: int) -> str:
    """image_id of row i without rendering its pixels (same rng draw order
    as _make_row, which calls _image_id first)."""
    return _image_id(seed, i, _rng_for(seed, i))


def _row_draws(seed: int, i: int, min_px: int, max_px: int) -> tuple:
    """The full deterministic draw sequence for row i: (image_id, w, h,
    fmt, pixels, caption). Single source of truth for the rng order —
    ``_make_row`` renders/encodes from it, ``row_meta`` projects the
    codec-free columns (the replay oracle's view)."""
    rng = _rng_for(seed, i)
    image_id = _image_id(seed, i, rng)
    w = int(rng.integers(min_px, max_px + 1))
    h = int(rng.integers(min_px, max_px + 1))
    fmt = "jpeg" if rng.random() < 0.7 else "png"
    px = _pixels(rng, w, h)
    return image_id, w, h, fmt, px, _caption(rng)


def row_meta(seed: int, i: int, min_px: int = 24, max_px: int = 64) -> tuple:
    """(image_id, w, h, fmt, caption) of row i without encoding its pixels —
    the SQL-replay oracle's codec-free projection of ``_make_row``."""
    image_id, w, h, fmt, _px, caption = _row_draws(seed, i, min_px, max_px)
    return image_id, w, h, fmt, caption


def _make_row(seed: int, i: int, min_px: int, max_px: int) -> tuple:
    image_id, w, h, fmt, px, caption = _row_draws(seed, i, min_px, max_px)
    data = encode_image_np(px, fmt)
    # phash of the *stored* pixels: for jpeg that is the quantized image, so
    # recomputing the hash from bytes always reproduces the column.
    from ..functions.image import decode_image_np

    ph = phash_np(decode_image_np(data))
    return (image_id, data, w, h, fmt, caption, ph)


def generate_images(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    min_px: int = 24,
    max_px: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic image+caption table of ``n`` rows."""
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_make_row(seed, int(i), min_px, max_px) for i in b["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(n, numPartitions=parts).mapInPandas(gen, IMAGE_SCHEMA)


def generate_change_batch(
    spark: SparkSession,
    n_base: int,
    batch_index: int,
    updates: int,
    inserts: int,
    deletes: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic CDC batch over a ``generate_images(n_base)`` table.

    Updates re-render existing ids with a new seed epoch; inserts extend the
    id axis; deletes tombstone existing ids (payload columns null — only the
    key + envelope matter for a delete, matching ST4 semantics).
    """
    parts = num_partitions or spark.sparkContext.defaultParallelism
    total = updates + inserts + deletes
    epoch = batch_index + 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for j in b["id"]:
                j = int(j)
                rng = _rng_for(seed + 7_777_777 * epoch, j)
                ts_us = _T0_US + np.timedelta64(epoch * 3_600_000_000, "us") + np.timedelta64(j, "us")
                ts = pd.Timestamp(ts_us)
                seq = epoch * 1_000_000_000 + j
                if j < updates:
                    base_i = int(rng.integers(0, n_base))
                    upd = _make_row(seed + epoch, base_i, 24, 64)
                    rows.append(
                        (_id_of(seed, base_i),) + upd[1:] + ("UPDATE-INSERT", False, ts, seq)
                    )
                elif j < updates + inserts:
                    new_i = n_base + epoch * 10_000_000 + j
                    r = _make_row(seed, new_i, 24, 64)
                    rows.append(r + ("INSERT", False, ts, seq))
                else:
                    base_i = int(rng.integers(0, n_base))
                    rows.append(
                        (_id_of(seed, base_i), None, None, None, None, None, None, "DELETE", True, ts, seq)
                    )
            # dtype=object: pandas' default inference turns int+None columns
            # into float64 and silently rounds int64 phash values above 2^53.
            out = pd.DataFrame(
                rows, columns=[f.name for f in CHANGE_SCHEMA.fields], dtype=object
            )
            for col, dtype in (("w", "Int32"), ("h", "Int32"), ("phash", "Int64"), ("change_seq", "Int64")):
                out[col] = out[col].astype(dtype)
            yield out

    return spark.range(total, numPartitions=parts).mapInPandas(gen, CHANGE_SCHEMA)

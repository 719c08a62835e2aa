"""Per-file key Bloom filters for manifest-level merge pruning.

Min/max footer stats prune a MERGE's candidate files only when data files
are range-clustered on the merge key. The common 100-TB CDC shape is the
opposite: freshly INGESTED files are time-ordered, so every file's
(min, max) image_id range spans essentially the whole key domain and range
pruning keeps 100% of files as candidates — even for a change batch that
physically touches a handful of them. (The reference connector hits exactly
this: Datastream drops change files in arrival order, and
``MergeQueries.upsertToDelta`` — reference MergeQueries.scala:33-106 — joins
the whole target. Delta/Iceberg answer with file-skipping indexes; this is
the icepack-native version.)

A Bloom filter over each file's key column closes that gap: a sparse batch
of b random keys against a table of F files with r rows each skips every
file containing none of the batch keys — P(skip) = (1 - r/N)^b, ~90% for a
0.1%% batch — independent of physical key order. False positives only
enlarge the candidate set (never wrong results); false negatives are
impossible, so pruning stays exact.

Storage: ``FileEntry.stats[col]["bloom"] = {"m": bits, "k": probes,
"b64": base64(bitmap)}`` next to min/max — ~1.2 bytes/row at the default
1% fpp, dwarfed by the pixels the skipped rewrite would have re-encoded.
Hashing is pandas' vectorized 64-bit ``hash_array`` (deterministic across
processes — pinned by tests) expanded to k probes by double hashing
(Kirsch–Mitzenmacher: h_i = h1 + i*h2 mod m, h2 forced odd).
"""

from __future__ import annotations

import base64
import math
from typing import Any

import numpy as np
import pandas as pd

__all__ = ["build_bloom", "bloom_from_stats", "bloom_might_contain"]

# ~9.6 bits/key, k=7 — the classic 1% false-positive sizing. fpp only
# affects how many already-range-surviving files get needlessly rewritten;
# 1% of a pruned set is noise, and halving it would double the manifest bytes.
DEFAULT_FPP = 0.01


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic uint64 remix (public splitmix64 finalizer) — derives the
    second hash stream for double hashing from the first."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


def _hash_values(values: np.ndarray) -> np.ndarray:
    """Vectorized, process-stable 64-bit hashes of a key column.

    Every value is hashed through its STRING form: the build side reads
    keys with pyarrow (int64 / large_string / object dtypes depending on
    file encoding) while the query side receives Arrow→pandas batches
    where a null turns int64 into float64 — dtype-sensitive hashing would
    silently produce false NEGATIVES (wrong merges). The string form is
    the one canonical representation both sides share, and matches
    Spark's ``CAST(key AS STRING)`` for string and integer keys (the
    types ``_footer_stats`` builds blooms for)."""
    values = np.asarray(values)
    if values.dtype.kind in ("i", "u", "U"):
        canon = values.astype("U").astype(object)
    else:
        canon = np.array([str(v) for v in values], dtype=object)
    return pd.util.hash_array(canon).astype(np.uint64)


def _probe_positions(h1: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) matrix of bit positions via double hashing."""
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def build_bloom(values: Any, fpp: float = DEFAULT_FPP) -> dict[str, Any]:
    """Bloom-filter stats entry for one file's key column (nulls dropped).

    Returns the JSON-storable dict that lands in ``stats[col]["bloom"]``."""
    arr = np.asarray(values)
    if arr.dtype == object:
        arr = np.array([v for v in arr if v is not None], dtype=object)
    n = max(1, len(arr))
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(arr):
        pos = _probe_positions(_hash_values(arr), k, m).ravel()
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
    return {"m": m, "k": k, "b64": base64.b64encode(bits.tobytes()).decode("ascii")}


def bloom_from_stats(entry: dict[str, Any]) -> tuple[np.ndarray, int, int]:
    """Decode a ``stats[col]["bloom"]`` dict → (bitmap, m, k)."""
    bits = np.frombuffer(base64.b64decode(entry["b64"]), dtype=np.uint8)
    return bits, int(entry["m"]), int(entry["k"])


def bloom_might_contain(
    bits: np.ndarray, m: int, k: int, values: Any, h1: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized membership test: bool per value (True = maybe present).

    ``h1`` lets a caller hash the batch keys ONCE and test them against many
    files' filters — the merge-pruning hot loop is files × keys, and the
    hash is the only per-key cost worth amortizing."""
    if h1 is None:
        h1 = _hash_values(np.asarray(values))
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(h1, k, m)
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    hit = (byte & np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))) != 0
    return hit.all(axis=1)

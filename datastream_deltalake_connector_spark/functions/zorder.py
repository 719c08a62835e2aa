"""Z-order (Morton) and Hilbert clustering keys.

North_rule: Z-order clustering by bit-interleaving ``(phash,
xxhash64(image_id))`` with a Hilbert-curve state-table variant. The reference
has no implementation — it delegates clustering to Databricks ``OPTIMIZE
ZORDER`` (reference: README.md:144-160); this module owns it.

Design choices:

- The Morton interleave is a pure Column expression (magic-number bit
  spreading: 5 shift/mask rounds per dimension) — stays inside whole-stage
  codegen, zero Python in the hot path, and has a mechanically identical SQL
  twin (``z_value_sql``) so DuckDB can oracle-check it bit-for-bit.
- Each signed-64 input is first reduced to an order-preserving 31-bit value
  (arithmetic shift right 33 then re-bias by +2^30): the interleaved result
  occupies ≤62 bits, so it never overflows a signed BIGINT in either engine.
- The Hilbert variant walks the classic rot/reflect state iteration (the
  "state table" of the north_rule) vectorized in numpy inside a pandas UDF —
  Arrow batches, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

__all__ = [
    "unsigned31",
    "z_value",
    "z_value_sql",
    "hilbert_value",
    "z_value_np",
    "hilbert_np",
]

_SPREAD_ROUNDS = [  # (shift, mask) — spread 32 low bits into even positions
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def unsigned31(col: Column) -> Column:
    """Order-preserving 31-bit reduction of a signed 64-bit column.

    Arithmetic-shift-right 33 keeps relative order; +2^30 re-biases the
    [-2^30, 2^30) result into [0, 2^31). Works identically in DuckDB."""
    return F.shiftright(col.cast("long"), 33) + F.lit(1 << 30)


def _spread(col: Column) -> Column:
    x = col
    for shift, mask in _SPREAD_ROUNDS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column, b: Column) -> Column:
    """62-bit Morton interleave of two signed-64 columns (a gets odd bits)."""
    return F.shiftleft(_spread(unsigned31(a)), 1).bitwiseOR(_spread(unsigned31(b)))


def z_value_sql(a: str, b: str, dialect: str = "duckdb") -> str:
    """SQL twin of z_value over BIGINT expressions ``a`` and ``b``.

    dialect='duckdb' (used by the oracle) or 'spark'. Both dialects support
    &, |, << on BIGINT; the expression only shifts masked non-negative
    values, so arithmetic vs logical shift semantics never diverge."""

    def u31(e: str) -> str:
        return f"((({e}) >> 33) + 1073741824)"

    def spread(e: str) -> str:
        x = e
        for shift, mask in _SPREAD_ROUNDS:
            x = f"((({x}) | (({x}) << {shift})) & {mask})"
        return x

    sa = spread(u31(f"CAST({a} AS BIGINT)"))
    sb = spread(u31(f"CAST({b} AS BIGINT)"))
    return f"((({sa}) << 1) | ({sb}))"


# ---------------------------------------------------------------- numpy twins
def _spread_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64)
    for shift, mask in _SPREAD_ROUNDS:
        x = (x | (x << shift)) & mask
    return x


def _unsigned31_np(x: np.ndarray) -> np.ndarray:
    return (x.astype(np.int64) >> 33) + (1 << 30)


def z_value_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (_spread_np(_unsigned31_np(a)) << 1) | _spread_np(_unsigned31_np(b))


def hilbert_np(a: np.ndarray, b: np.ndarray, order: int = 31) -> np.ndarray:
    """Vectorized Hilbert index (xy → d) at the given curve order.

    Classic bottom-up rotate/reflect iteration; all numpy, no Python loop
    over rows (the loop is over the ``order`` bit levels only)."""
    x = _unsigned31_np(a).astype(np.int64)
    y = _unsigned31_np(b).astype(np.int64)
    if order < 31:
        x >>= 31 - order
        y >>= 31 - order
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= 1
    return d


def hilbert_value(a: Column, b: Column, order: int = 31) -> Column:
    """Hilbert clustering key as an Arrow-vectorized pandas UDF."""

    @pandas_udf(LongType())
    def _hilbert(pa: pd.Series, pb: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_np(
                pa.to_numpy(dtype=np.int64, na_value=0),
                pb.to_numpy(dtype=np.int64, na_value=0),
                order,
            )
        )

    return _hilbert(a.cast("long"), b.cast("long"))

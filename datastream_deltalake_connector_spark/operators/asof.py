"""As-of (most-recent-prior) join — the temporal join Spark has no native
operator for (DuckDB: ``ASOF JOIN``; kdb: ``aj``; pandas: ``merge_asof``).

For every left row, attach the single right row with the largest
``right_ts <= left_ts`` within the same key group (backward-inclusive).
The classic use: enrich an event with the most recent state snapshot,
price tick, or preceding action of the same user.

Spark-first plan — NOT a range join (which Catalyst would execute as a
key-equi join + per-key cross filter, exploding on hot keys) but the
union-window formulation:

1. tag right rows (side=0) carrying their payload, left rows (side=1)
   carrying null payload;
2. union — a zero-cost plan node;
3. one window ``partitionBy(keys).orderBy(ts, side, tiebreak)`` with
   ``last(payload, ignorenulls=True)`` over ``rowsBetween(unbounded, 0)``;
4. keep side=1 rows: each left row now carries the latest right payload
   at-or-before its timestamp.

Cost: exactly ONE shuffle on the join keys plus a per-partition sort —
identical to any windowed aggregation, linear in |left| + |right|, and
immune to the |left|×|right| per-key blowup of the naive range join.
Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), which
is what makes the join inclusive (``<=``), matching DuckDB ASOF
``ON l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join"]


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can sort values of this type (MapType cannot,
    recursively)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every ``left`` row (all its
    columns) plus ``prefix + right_ts`` and ``prefix + c`` for each payload
    column — null when no right row precedes the left row in its group.

    Ties inside ``right`` on (keys, right_ts): pass ``tiebreak`` (a right
    column with unique values per (keys, ts), e.g. an event id) to break
    them with a COMPACT sort key. Without it, orderable payloads fall back
    to ordering by the payload struct itself (deterministic but the sort
    compares full payloads — pass ``tiebreak`` when payloads are wide);
    payloads containing maps are not orderable, so ties then resolve
    arbitrarily rather than failing the job.

    Null-key and null-timestamp right rows are dropped up front: an
    equi-join (and DuckDB ASOF's ``ON l.k = r.k AND l.ts >= r.ts``) can
    never match them, but the window formulation would otherwise group
    null keys together and sort null timestamps first (nulls-first asc),
    silently attaching them. Null-key LEFT rows are preserved with a null
    payload, matching ASOF LEFT JOIN.
    """
    # a right row whose key or timestamp is null can never win a match
    right_clean = right
    for k in [*on, right_ts]:
        right_clean = right_clean.where(F.col(k).isNotNull())
    payload_cols = [c for c in payload_cols if c != right_ts]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r = right_clean.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *( [F.col(tiebreak).alias("__tb")] if tiebreak else [] ),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *(
            [F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb")]
            if tiebreak
            else []
        ),
    )
    # align schemas: null-fill the non-key left columns on the right side
    # in ONE select (a per-column withColumn chain re-analyzes a growing
    # plan each iteration — quadratic for wide CDC payloads)
    ltypes = dict(left.dtypes)
    r = r.select(
        "*",
        *[
            F.lit(None).cast(ltypes[c]).alias(c)
            for c in left_cols
            if c not in on
        ],
    )
    u = r.select(l.columns).unionByName(l)

    # final sort key: explicit tiebreak > orderable payload struct > none.
    # Left rows carry null payload/tiebreak, so their relative order within
    # side=1 is irrelevant — the window only reads __payload.
    order_cols = [F.col("__evt_ts"), F.col("__side")]
    if tiebreak:
        order_cols.append(F.col("__tb"))
    elif _orderable(r.schema["__payload"].dataType):
        order_cols.append(F.col("__payload"))
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
    out = matched.where(F.col("__side") == 1).select(
        *left_cols,
        F.col("__m.__ts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
    return out

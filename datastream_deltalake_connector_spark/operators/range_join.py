"""Bucketed point-in-interval range join.

Spark has no native range-join operator: a plain
``points JOIN intervals ON key AND start <= ts AND ts <= end`` plans as an
equi-join on the key followed by a per-key filter — a per-key CROSS PRODUCT
that explodes on hot keys (one user with 10k points × 10k intervals is 10^8
filter evaluations). The classic fix (what Databricks' range-join hint does
under the hood) is time bucketing:

1. assign each point to the bucket its timestamp falls in;
2. explode each interval to one row per bucket it COVERS
   (``sequence(floor(start/w), floor(end/w))`` — cheap when the bucket
   width is chosen near the typical interval length, so ~1-2 buckets per
   interval);
3. equi-join on (key, bucket) — the shuffle key now spreads each hot key
   across its time range — and re-check the exact predicate.

Each (point, interval) pair can only meet in the point's own bucket, so the
output needs no dedup. Cost: one shuffle on (key, bucket), join fan-in per
task bounded by points-per-bucket × intervals-overlapping-that-bucket,
independent of the per-key totals that kill the naive plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join"]


def _epoch(col: str):
    # timestamp_ntz cannot cast straight to double; go through ltz (the
    # same sub-second-exact trick the sessionize query uses)
    return F.col(col).cast("timestamp_ltz").cast("double")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to every interval (same ``on`` keys) with
    ``start_ts <= point_ts <= end_ts`` (inclusive both ends). Column names
    must be disjoint apart from the ``on`` keys — alias before calling.
    Pick ``bucket_seconds`` near the typical interval length: wider wastes
    filter work, narrower multiplies the interval explode."""
    pb = points.withColumn(
        "__b", F.floor(_epoch(point_ts) / bucket_seconds).cast("long")
    )
    ib = (
        intervals.withColumn(
            "__bs", F.floor(_epoch(start_ts) / bucket_seconds).cast("long")
        )
        .withColumn("__be", F.floor(_epoch(end_ts) / bucket_seconds).cast("long"))
        # Guard inverted intervals (end < start, e.g. an end_ts at epoch 0):
        # F.sequence would generate a DESCENDING run of millions of spurious
        # bucket rows (or trip Spark's sequence-length limit) for a single
        # malformed row. Clamping yields exactly one bucket, and the exact
        # recheck below drops it — output unchanged, blast radius bounded.
        .withColumn("__be", F.greatest(F.col("__bs"), F.col("__be")))
        .withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    return (
        pb.join(ib, [*on, "__b"])
        .where(
            (F.col(start_ts) <= F.col(point_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("__b")
    )

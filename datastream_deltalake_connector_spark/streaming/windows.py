"""Watermarked event-time windowed aggregation for streams.

The reference has no watermarks or event-time windows (SURVEY ST2 — its
late-data story is the relational ``<=`` merge guard). This engine keeps
that guard for CDC, and adds the native Structured Streaming shape for
metric/rollup pipelines over the ingested tables: ``withWatermark`` +
``groupBy(window(...))`` in append mode, so each window row is emitted
exactly once — when the watermark proves it complete — and the state store
evicts closed windows instead of growing forever.

Scale posture: the windowed aggregate is a partial (map-side combined)
HashAggregate before one shuffle on (window, group keys); state per
executor is bounded by (open windows × groups), independent of event
volume. Watermark persistence lives in the query checkpoint, so a restart
resumes with the same completeness frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_agg_stream"]


def windowed_agg_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (and optional value sum) with a watermark.

    In append mode a window's row appears only after the watermark
    (max event time − ``watermark_delay``) passes the window end: late
    events inside the delay still count; later ones are dropped by the
    state store — the streaming analogue of the batch
    ``events_windowed_agg`` query.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    win = F.window(F.col(ts_col), window_duration)
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("win"), *group_cols)
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            *[F.col(c) for c in (["n"] + (["total_value"] if value_col else []))],
        )
    )

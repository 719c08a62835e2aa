"""Stateful streaming LWW dedup: state persists across availableNow drains
via the checkpointed state store; stale events are filtered in-stream."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datastream_deltalake_connector_spark.streaming.stateful import dedup_stream_lww

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("source_timestamp", T.TimestampType()),
        T.StructField("change_seq", T.LongType()),
    ]
)


def drain(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    deduped = dedup_stream_lww(stream, ["id"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rows_of(spark, out_dir):
    return sorted(
        map(tuple, spark.read.parquet(out_dir).select("id", "payload", "change_seq").collect())
    )


def test_stateful_lww_across_drains(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    ts = lambda m: datetime(2024, 1, 1, 0, m)
    # drain 1: two keys, in-batch duplicate for k1 (seq 2 wins)
    write_batch("b1", [
        ("k1", "v1", ts(1), 1),
        ("k1", "v2", ts(1), 2),
        ("k2", "w1", ts(2), 3),
    ])
    drain(spark, in_dir, out_dir, ckpt)
    assert rows_of(spark, out_dir) == [("k1", "v2", 2), ("k2", "w1", 3)]

    # drain 2: stale event for k1 (older ts) filtered by STATE, fresh k2 wins,
    # new key k3 passes
    write_batch("b2", [
        ("k1", "stale", ts(0), 9),
        ("k2", "w2", ts(5), 4),
        ("k3", "x1", ts(5), 5),
    ])
    drain(spark, in_dir, out_dir, ckpt)
    assert rows_of(spark, out_dir) == [
        ("k1", "v2", 2),
        ("k2", "w1", 3),
        ("k2", "w2", 4),
        ("k3", "x1", 5),
    ]

    # drain 3: equal-ordering replay of k3 re-emits (idempotent semantics)
    write_batch("b3", [("k3", "x1", ts(5), 5)])
    drain(spark, in_dir, out_dir, ckpt)
    out = rows_of(spark, out_dir)
    assert out.count(("k3", "x1", 5)) == 2  # re-emitted, merge absorbs it


EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_stateful_sessionize_across_drains(spark, tmp_path):
    """Streaming sessionization: sessions close only on evidence (a later
    event beyond the gap); the open session persists in checkpointed state
    across drains and is stitched when the next drain's events continue it."""
    from datetime import datetime, timedelta

    from datastream_deltalake_connector_spark.streaming.stateful import (
        sessionize_stream,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("sin", "sout", "sckpt"))
    os.makedirs(in_dir)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    m = lambda mins: t0 + timedelta(minutes=mins)

    def drain_sessions():
        stream = spark.readStream.schema(EV_SCHEMA).parquet(in_dir)
        q = (
            sessionize_stream(stream, key="user_id", ts_col="ts", gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def sessions():
        return sorted(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out_dir).collect()
        )

    # drain 1: u1 has two bursts separated by 40 min (> 30 gap) → first
    # burst closes; second stays open. u2 one burst → stays open.
    spark.createDataFrame(
        [(1, m(0)), (1, m(5)), (1, m(45)), (1, m(50)), (2, m(0))], EV_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    drain_sessions()
    assert sessions() == [(1, m(0), m(5), 2)]

    # drain 2: u1 continues its open burst within the gap (55) then jumps
    # past it (120) → burst (45..55) closes with the stitched count of 3;
    # u2 jumps far → its 1-event session closes.
    spark.createDataFrame([(1, m(55)), (1, m(120)), (2, m(90))], EV_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    drain_sessions()
    assert sessions() == [
        (1, m(0), m(5), 2),
        (1, m(45), m(55), 3),
        (2, m(0), m(0), 1),
    ]


WSCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_watermark_windowed_agg_across_drains(spark, tmp_path):
    """Append-mode windowed agg emits a window exactly once, only after the
    watermark (max event time - delay) passes the window end; the frontier
    persists in the checkpoint across drains."""
    from datastream_deltalake_connector_spark.streaming.windows import (
        windowed_agg_stream,
    )

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("win", "wout", "wckpt"))
    os.makedirs(in_dir)

    def write(rows):
        spark.createDataFrame(rows, WSCHEMA).coalesce(1).write.mode("append").parquet(in_dir)

    def drain():
        stream = spark.readStream.schema(WSCHEMA).parquet(in_dir)
        agg = windowed_agg_stream(
            stream, ts_col="ts", window_duration="1 day", watermark_delay="1 hour"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
            for r in spark.read.parquet(out_dir).collect()
        )

    d = lambda day, h: datetime(2024, 1, day, h)
    # drain 1: day-1 and day-2 events; max ts = day2 12:00 -> watermark
    # day2 11:00 closes ONLY the day-1 window
    write([
        (d(1, 3), "click", 1.0),
        (d(1, 5), "click", 2.0),
        (d(1, 7), "buy", 10.0),
        (d(2, 12), "click", 4.0),
    ])
    got = drain()
    assert got == [
        ("2024-01-01 00:00:00", "buy", 1, 10.0),
        ("2024-01-01 00:00:00", "click", 2, 3.0),
    ]
    # a LATE day-1 event inside no window still open is dropped; day-4
    # arrival moves the watermark past day 2 (and 3): day-2 window emits
    # WITHOUT the late day-1 row
    write([
        (d(1, 9), "click", 100.0),   # late: window already closed -> dropped
        (d(4, 2), "buy", 7.0),
    ])
    got = drain()
    assert got == [
        ("2024-01-01 00:00:00", "buy", 1, 10.0),
        ("2024-01-01 00:00:00", "click", 2, 3.0),
        ("2024-01-02 00:00:00", "click", 1, 4.0),
    ]

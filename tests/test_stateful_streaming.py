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

"""Structured Streaming ingest: CDC file dumps → log table → merged icepack.

Port of the reference's two-stream-per-table wiring (reference:
jobs/DatastreamDeltaConnector.scala:35-84, datastream/DatastreamIO.scala:
45-104) with icepack in place of Delta:

    stream 1 (ingest):  readStream(file source, maxFilesPerTrigger)
                        → append-only parquet "log table"           (S5→S7)
    stream 2 (merge):   readStream(log table) → foreachBatch(
                        flatten envelope → merge_into_table)        (S6→S8)

Semantics preserved:
- ``maxFilesPerTrigger`` = the reference's ``file-read-concurrency``
  throttle (DatastreamIO.scala:93-94, default 2).
- checkpointLocation per query → exactly-once delivery into the log table
  and at-least-once batch ids into the merge; the merge itself is idempotent
  under replay (the ``<=`` guard), which is what makes the at-least-once
  foreachBatch safe — same argument as the reference (README.md:142,164).
- per-table failure isolation: one table's setup failure logs and continues
  (DatastreamDeltaConnector.scala:79-83 Failure branch).
- ``available_now=True`` drains all currently-visible files then stops — the
  batch-oriented maintenance engine's way to run the same pipeline on a
  schedule instead of a resident stream.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.table_merge import merge_into_table
from ..sources.cdc import (
    DatastreamTable,
    TableMetadata,
    discover_tables,
    flatten_envelope,
    read_table_batch,
)
from ..table.icepack import IcepackTable

__all__ = ["ingest_table_to_log", "merge_log_to_table", "run_connector_once"]


def ingest_table_to_log(
    spark: SparkSession,
    table: DatastreamTable,
    log_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int = 2,
    available_now: bool = True,
    microbatch_partitions: int | None = None,
):
    """Stream 1: file source → append-only parquet log table. Returns the
    started StreamingQuery. Schema comes from a one-record batch probe (the
    reference flips on global streaming schema inference instead,
    DatastreamDeltaStreamingJob.scala:27 — an explicit probe is cheaper and
    pins the schema per query).

    ``microbatch_partitions`` is the reference's DELTA_MICROBATCH_PARTITIONS
    → ``coalesce(n)`` small-file control (Config.scala:51-54, applied at
    DatastreamIO.scala:97): without it each micro-batch writes one file per
    source split, and small-file accumulation is the reference's documented
    #1 failure mode (README.md:146-151). The log table's files are also
    bounded per drain, not only per trigger, because availableNow drains
    write one batch per trigger group."""
    probe = read_table_batch(spark, table, fmt)
    glob = os.path.join(table.table_path, "*/*/*/*/*")
    if fmt == "avro":
        # binaryFile stream + executor-side OCF decode (sources/avro.py);
        # maxFilesPerTrigger throttles identically to the jar-based source
        from ..sources.avro import avro_stream

        stream = avro_stream(spark, glob, max_files_per_trigger)
    else:
        reader = (
            spark.readStream.format(fmt)
            .schema(probe.schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
        )
        if fmt == "json":
            reader = reader.option("multiline", "true").option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
            )
        stream = reader.load(glob)
    for c in ("read_timestamp", "source_timestamp"):
        if c in stream.columns:
            stream = stream.withColumn(c, F.to_timestamp(c))
    if microbatch_partitions:
        stream = stream.coalesce(microbatch_partitions)
    writer = (
        stream.writeStream.format("parquet")
        .option("path", log_dir)
        .option("checkpointLocation", os.path.join(checkpoint_dir, f"{table.table}_log"))
        .outputMode("append")
        .queryName(f"datastream-ingest-{table.table}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_log_to_table(
    spark: SparkSession,
    log_dir: str,
    target: IcepackTable,
    checkpoint_dir: str,
    meta: TableMetadata,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Stream 2: log table → foreachBatch merge (reference foreachBatch sink,
    DatastreamDeltaConnector.scala:57-77). Each micro-batch flattens the
    envelope and runs the engine's MERGE; batch replays are absorbed by the
    idempotent ``<=`` guard."""
    stream = spark.readStream.schema(
        spark.read.parquet(log_dir).schema
    ).parquet(log_dir)

    def upsert(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():  # ST6 empty-batch short-circuit
            return
        key = meta.primary_keys[0] if meta.primary_keys else "id"
        changes = flatten_envelope(batch_df, meta)
        merge_into_table(target, changes, key=key, job_id=f"stream-batch-{batch_id}")

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "merge"))
        .queryName(f"datastream-merge-{meta.table}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        # the reference's merge-frequency trigger (Config.scala:41-47)
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def run_connector_once(
    spark: SparkSession,
    stream_root: str,
    warehouse: str,
    fmt: str = "json",
    max_files_per_trigger: int = 2,
    table_source=None,
    microbatch_partitions: int | None = None,
) -> dict[str, str]:
    """Discover every table of the stream and drain it end-to-end
    (ingest → log → merged icepack table), one pair of availableNow streams
    per table. Returns table → merged-table path. Failure of one table's
    setup is logged and the others continue (ST7).

    ``table_source``: any sources.discovery.TableSource (e.g. GCSTableSource
    with an injected client); defaults to the local lister over
    ``stream_root`` — the reference's TableProvider dispatch
    (TableProvider.scala:11-29)."""
    if table_source is None:
        from ..sources.discovery import LocalTableSource

        table_source = LocalTableSource(stream_root)
    results: dict[str, str] = {}
    for table in table_source.list_tables():
        try:
            probe = read_table_batch(spark, table, fmt)
            meta = TableMetadata.from_df(probe)
            if meta is None:
                continue
            log_dir = os.path.join(warehouse, f"{table.table}_log")
            ckpt = os.path.join(warehouse, "_checkpoints", table.table)
            q1 = ingest_table_to_log(
                spark, table, log_dir, ckpt, fmt, max_files_per_trigger,
                microbatch_partitions=microbatch_partitions,
            )
            q1.awaitTermination()

            from ..operators.merge import SEQ_META, TS_META
            from pyspark.sql import types as T

            merged_root = os.path.join(warehouse, f"{table.table}_merged")
            if os.path.exists(os.path.join(merged_root, "metadata", "HEAD")):
                t = IcepackTable.load(spark, merged_root)
            else:
                schema = T.StructType(
                    list(meta.payload_schema.fields)
                    + [
                        T.StructField(TS_META, T.TimestampType()),
                        T.StructField(SEQ_META, T.LongType()),
                    ]
                )
                t = IcepackTable.create(spark, merged_root, schema)
            q2 = merge_log_to_table(spark, log_dir, t, ckpt, meta)
            q2.awaitTermination()
            results[table.table] = merged_root
        except Exception as exc:  # noqa: BLE001 — per-table isolation (ST7)
            print(f"table {table.table} failed, continuing: {exc}")
    return results

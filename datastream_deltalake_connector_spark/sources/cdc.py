"""Datastream-style CDC file-dump sources: discovery, envelope metadata,
batch reads, and envelope→change-batch flattening.

Port of the reference's source layer to PySpark:

- Table discovery (reference: datastream/DatastreamTable.scala:3-5,
  utils/FileOps.scala:7-15 local, google/GCSOps.scala:14-44 GCS): a stream
  root contains one subdirectory per source table; files live under a
  5-level ``yyyy/MM/dd/HH/mm`` layout read via glob
  (datastream/DatastreamIO.scala:106-107).
- TableMetadata (delta/TableMetadata.scala:14-75): probe one record to learn
  the table name, database, primary keys, payload schema, and the
  source-specific ordering columns — MySQL ``(source_timestamp, log_file,
  log_position)``, Oracle ``(source_timestamp, scn)``, generic Datastream
  ``(source_timestamp,)`` — sniffed from ``read_method.split('-')[0]``.
- Envelope flattening: the reference keeps the nested envelope and lets
  Delta MERGE reference ``s.payload.<f>`` (MergeQueries.scala:138-150); our
  merge core takes flat change batches, so ``flatten_envelope`` projects
  payload.* plus the ordering/delete columns into the engine's change-batch
  shape (FIXTURES.md §3). ``change_seq`` is a single deterministic ordering
  long derived from the source tiebreakers so the composite orderBy of the
  reference collapses to the engine's two-column ordering.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "DatastreamTable",
    "TableMetadata",
    "discover_tables",
    "read_table_batch",
    "flatten_envelope",
    "GLOB_5_LEVEL",
]

GLOB_5_LEVEL = "*/*/*/*/*"  # yyyy/MM/dd/HH/mm (DatastreamIO.scala:106-107)

SUPPORTED_FORMATS = {"json", "parquet", "avro"}
# Avro (the reference's DEFAULT, application.conf:10; dispatch at
# DatastreamIO.scala:30-34) is read WITHOUT the spark-avro jar: a pure-Python
# OCF decoder runs inside mapInPandas over a binaryFile scan (sources/avro.py)
# — decode stays on executors, schema pinned by one driver-side header read.


@dataclass
class DatastreamTable:
    """A discovered source table (reference: DatastreamTable.scala:3-5)."""

    path: str
    table: str

    @property
    def table_path(self) -> str:
        return os.path.join(self.path, self.table)


def discover_tables(root: str) -> list[DatastreamTable]:
    """Local-filesystem discovery: every subdirectory of the stream root is a
    table (reference: FileOps.scala:7-15 + TableProvider.scala:26-29). The
    GCS variant pages blobs and collects first path segments
    (GCSOps.scala:14-44) — same contract, different lister; it would slot in
    behind this function when a GCS client is available."""
    if not os.path.isdir(root):
        return []
    return [
        DatastreamTable(root, name)
        for name in sorted(os.listdir(root))
        if os.path.isdir(os.path.join(root, name))
    ]


@dataclass
class TableMetadata:
    """Everything needed to build a merge (reference: TableMetadata.scala:14-21)."""

    source_type: str  # 'mysql' | 'oracle' | 'datastream'
    table: str
    database: str | None
    primary_keys: list[str]
    order_by: list[str]  # envelope-relative column paths, descending priority
    payload_schema: T.StructType
    payload_fields: list[str] = field(default_factory=list)

    def __post_init__(self):
        if not self.payload_fields:
            self.payload_fields = [f.name for f in self.payload_schema.fields]

    @staticmethod
    def from_df(df: DataFrame) -> "TableMetadata | None":
        """Probe the first record (reference: TableMetadata.scala:37-68);
        empty batch → None (the reference's merge-skip, MergeQueries.scala:
        45-47)."""
        head = df.select(
            F.col("read_method"),
            F.col("source_metadata.table").alias("table"),
            F.col("source_metadata.database").alias("database"),
            F.col("source_metadata.primary_keys").alias("primary_keys"),
        ).head(1)
        if not head:
            return None
        row = head[0]
        # source sniffing: read_method like 'mysql-cdc-binlog'
        # (TableMetadata.scala:70-75)
        source_type = (row["read_method"] or "datastream").split("-")[0]
        if source_type == "mysql":
            order_by = [
                "source_timestamp",
                "source_metadata.log_file",
                "source_metadata.log_position",
            ]
        elif source_type == "oracle":
            order_by = ["source_timestamp", "source_metadata.scn"]
        else:
            order_by = ["source_timestamp"]
        payload_schema = df.schema["payload"].dataType
        return TableMetadata(
            source_type=source_type,
            table=row["table"],
            database=row["database"],
            primary_keys=list(row["primary_keys"] or []),
            order_by=order_by,
            payload_schema=payload_schema,
        )


def read_table_batch(
    spark: SparkSession, table: DatastreamTable, fmt: str = "json"
) -> DataFrame:
    """Batch read of every dump file of a table through the 5-level glob
    (reference: DatastreamIO.scala:106-107; format dispatch :30-34)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported CDC dump format: {fmt!r}")
    glob = os.path.join(table.table_path, GLOB_5_LEVEL)
    if fmt == "avro":
        from .avro import read_avro

        df = read_avro(spark, glob)
        for c in ("read_timestamp", "source_timestamp"):
            if c in df.columns and not isinstance(df.schema[c].dataType, T.TimestampType):
                df = df.withColumn(c, F.to_timestamp(c))
        return df
    reader = spark.read
    if fmt == "json":
        # multiline + ISO timestamps, as the reference's test reader does
        # (MergeIntoSuiteBase.scala:51-59)
        reader = reader.option("multiline", "true").option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        )
    df = reader.format(fmt).load(glob)
    for c in ("read_timestamp", "source_timestamp"):
        if c in df.columns and not isinstance(df.schema[c].dataType, T.TimestampType):
            df = df.withColumn(c, F.to_timestamp(c))
    return df


def flatten_envelope(df: DataFrame, meta: TableMetadata) -> DataFrame:
    """Envelope → engine change batch: payload.* ⊕ (change_type, is_deleted,
    source_timestamp, change_seq).

    ``change_seq`` encodes the source tiebreakers into one long so the
    engine's two-column LWW ordering reproduces the reference's composite
    descending orderBy (TableMetadata.scala:24-32): MySQL uses
    ``xxhash-free`` monotonic composition of (log_file rank is not global —
    Datastream guarantees log_position monotonic per file and log_file names
    sort lexicographically, so we order by a 64-bit pack of
    (file-suffix-number, log_position)); Oracle uses ``scn`` directly."""
    payload_cols = [F.col(f"payload.{f}").alias(f) for f in meta.payload_fields]
    if meta.source_type == "mysql":
        # log_file like 'mysql-bin.000002' → numeric suffix; pack into high
        # bits over log_position (both fit comfortably in 31/32 bits).
        file_no = F.coalesce(
            F.regexp_extract(F.col("source_metadata.log_file"), r"(\d+)$", 1).cast("long"),
            F.lit(0),
        )
        seq = F.shiftleft(file_no, 32) + F.coalesce(
            F.col("source_metadata.log_position").cast("long"), F.lit(0)
        )
    elif meta.source_type == "oracle":
        seq = F.coalesce(F.col("source_metadata.scn").cast("long"), F.lit(0))
    else:
        seq = F.lit(0).cast("long")
    return df.select(
        *payload_cols,
        F.coalesce(F.col("source_metadata.change_type"), F.lit("UPSERT")).alias(
            "change_type"
        ),
        F.coalesce(F.col("source_metadata.is_deleted"), F.lit(False)).alias(
            "is_deleted"
        ),
        F.col("source_timestamp"),
        seq.alias("change_seq"),
    )

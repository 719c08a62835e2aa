"""datastream_deltalake_connector_spark — a PySpark-native lakehouse maintenance engine.

A from-scratch re-expression of the query/data-processing semantics of
badal-io/datastream-deltalake-connector (reference at /root/reference, Scala +
Delta Lake) as an idiomatic PySpark engine:

- CDC change-batch MERGE with last-writer-wins window dedup and a monotonic
  timestamp guard (reference: spark/src/main/scala/io/badal/databricks/delta/
  MergeQueries.scala).
- Its own minimal Iceberg-style table format ("icepack"): immutable parquet
  data files + per-file min/max stats manifests + versioned snapshots with an
  atomic HEAD pointer (the reference delegates this to Delta Lake; we own it).
- Table maintenance the reference only *configures* via Databricks confs
  (reference: config/Config.scala:57-111): bin-packing compaction, Z-order /
  Hilbert clustering, manifest stat rewrite, reachability-based snapshot
  expiry, per-partition lineage checkpointing.
- Training-data pipeline operators: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  ANN similarity search, text quality analysis, image pandas-UDF plumbing.

Everything is DataFrame-first: Catalyst handles pushdown/pruning/join
planning; Python only manages metadata on the driver and vectorized Arrow
batches inside pandas UDFs.
"""

__version__ = "0.1.0"

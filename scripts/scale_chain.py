"""10x-scale maintenance chain: the direct evidence that the engine's
driver-side metadata and shuffle machinery survive an order-of-magnitude
row-count jump beyond the bench gate (80k images / ~1 GB), complementing the
1M-entry manifest unit test with a LIVE end-to-end chain.

Builds a deterministic image table with 10x the bench row count at small
pixel sizes (so it fits this sandbox's memory), then runs the full
maintenance chain — compact, CoW merge (10% batch), MoR merge + deferred
apply_deletes, Z-order cluster, full scan — recording per-stage wall time,
driver max-RSS, file counts, and the merge's touched-file evidence.

Usage: python scripts/scale_chain.py [n_images] [cores]
Appends nothing; prints one JSON line — the committed numbers live in
TESTDATA.md's "10x scale chain" section.
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from datastream_deltalake_connector_spark.operators.clustering import cluster
    from datastream_deltalake_connector_spark.operators.compaction import compact
    from datastream_deltalake_connector_spark.operators.merge import SEQ_META, TS_META
    from datastream_deltalake_connector_spark.operators.mor import (
        apply_deletes,
        merge_into_table_mor,
    )
    from datastream_deltalake_connector_spark.operators.table_merge import (
        merge_into_table,
    )
    from datastream_deltalake_connector_spark.session import get_spark
    from datastream_deltalake_connector_spark.sources.generator import (
        MERGED_IMAGE_SCHEMA,
        generate_change_batch,
        generate_images,
    )
    from datastream_deltalake_connector_spark.table import IcepackTable

    spark = get_spark(
        app_name="scale-chain", cores=cores, shuffle_partitions=cores
    )
    out: dict = {"n_images": n_images, "cores": cores}
    root = os.path.join(tempfile.mkdtemp(prefix="scale-chain-"), "images")
    t = IcepackTable.create(spark, root, MERGED_IMAGE_SCHEMA)

    t0 = time.time()
    for i in range(10):
        chunk = generate_images(
            spark, n_images // 10, seed=42 + i, min_px=24, max_px=32
        ).select(
            "*",
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(TS_META),
            F.lit(0).cast("long").alias(SEQ_META),
        )
        t.append(chunk, num_files=16)
    out["ingest_sec"] = round(time.time() - t0, 1)
    out["table_bytes"] = sum(e.bytes for e in t.files())
    out["files_after_ingest"] = len(t.files())
    out["rss_gb_after_ingest"] = rss_gb()

    t0 = time.time()
    compact(t, target_bytes=256 * 1024 * 1024)
    out["compact_sec"] = round(time.time() - t0, 1)
    out["files_after_compact"] = len(t.files())

    n_changes = n_images // 10
    bdir = os.path.join(tempfile.mkdtemp(prefix="scale-batch-"), "b")
    generate_change_batch(
        spark, n_images, batch_index=0,
        updates=n_changes // 2, inserts=n_changes // 4, deletes=n_changes // 4,
    ).write.parquet(bdir)
    batch = spark.read.parquet(bdir)
    t0 = time.time()
    merge_into_table(t, batch)
    out["merge_sec"] = round(time.time() - t0, 1)
    out["merge_changes_per_sec"] = round(n_changes / out["merge_sec"])
    s = t.snapshot().summary
    out["merge_touched_files"] = s.get("touched_files")
    out["merge_rewrite_mode"] = s.get("rewrite_mode")
    shutil.rmtree(os.path.dirname(bdir), ignore_errors=True)

    bdir = os.path.join(tempfile.mkdtemp(prefix="scale-batch-"), "b")
    generate_change_batch(
        spark, n_images, batch_index=1,
        updates=n_changes // 2, inserts=n_changes // 4, deletes=n_changes // 4,
    ).write.parquet(bdir)
    batch = spark.read.parquet(bdir)
    t0 = time.time()
    merge_into_table_mor(t, batch)
    out["merge_mor_sec"] = round(time.time() - t0, 1)
    out["merge_mor_changes_per_sec"] = round(n_changes / out["merge_mor_sec"])
    t0 = time.time()
    apply_deletes(t)
    out["apply_deletes_sec"] = round(time.time() - t0, 1)
    shutil.rmtree(os.path.dirname(bdir), ignore_errors=True)

    t0 = time.time()
    cluster(t, curve="zorder", num_files=2 * cores)
    out["cluster_sec"] = round(time.time() - t0, 1)
    out["files_after_cluster"] = len(t.files())

    t0 = time.time()
    row = t.scan().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("bytes")).alias("b")
    ).collect()[0]
    out["scan_sec"] = round(time.time() - t0, 1)
    out["scan_rows"] = row["n"]
    out["scan_images_per_sec"] = round(row["n"] / out["scan_sec"])
    out["rss_gb_final"] = rss_gb()
    stage_keys = [
        "ingest_sec", "compact_sec", "merge_sec", "merge_mor_sec",
        "apply_deletes_sec", "cluster_sec", "scan_sec",
    ]
    out["wall_total_sec"] = round(sum(out[k] for k in stage_keys), 1)
    spark.stop()
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    print("SCALE_CHAIN_JSON:" + json.dumps(out))


if __name__ == "__main__":
    main()

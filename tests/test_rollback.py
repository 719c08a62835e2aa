"""Snapshot rollback (Delta RESTORE TABLE / Iceberg rollback_to_snapshot
parity): a NEW commit whose manifest is exactly the target snapshot's entry
list, seq numbers preserved so pending MoR equality deletes re-scope
identically. History stays time-travelable; restore after physical file
removal fails loudly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.jobs import main
from datastream_deltalake_connector_spark.operators.expire import (
    expire_snapshots,
    remove_orphans,
)
from datastream_deltalake_connector_spark.operators.mor import (
    apply_deletes,
    merge_into_table_mor,
)
from datastream_deltalake_connector_spark.operators.table_merge import merge_into_table
from datastream_deltalake_connector_spark.sources.generator import (
    MERGED_IMAGE_SCHEMA,
    generate_change_batch,
    generate_images,
)
from datastream_deltalake_connector_spark.table import IcepackTable

N_BASE = 120

STATS_COLS = [
    "image_id", "phash", "w", "h", "fmt",
    "datastream_metadata_source_timestamp", "datastream_metadata_change_seq",
]


def fresh_table(spark, tmp_path, name="rb", num_files=5):
    t = IcepackTable.create(
        spark, str(tmp_path / name), MERGED_IMAGE_SCHEMA, stats_cols=STATS_COLS
    )
    base = generate_images(spark, N_BASE, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    )
    t.append(base, num_files=num_files)
    return t


def key_state(t, version=None):
    return sorted(
        (r["image_id"], r["caption"], r["phash"])
        for r in t.scan(version=version)
        .select("image_id", "caption", "phash")
        .collect()
    )


def cb(spark, i, **kw):
    kw.setdefault("updates", 20)
    kw.setdefault("inserts", 10)
    kw.setdefault("deletes", 8)
    return generate_change_batch(spark, N_BASE, batch_index=i, num_partitions=4, **kw)


def test_rollback_undoes_cow_merge(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    v1 = t.head_version()
    before = key_state(t)
    merge_into_table(t, cb(spark, 0), target_rows_per_file=100)
    assert key_state(t) != before
    v_merge = t.head_version()

    v_rb = t.rollback(v1)
    assert v_rb == v_merge + 1  # new commit, not a HEAD rewind
    assert key_state(t) == before
    snap = t.snapshot()
    assert snap.operation == "rollback"
    assert snap.summary["restored_version"] == v1
    # manifest is exactly the target's entry list
    assert {e.path for e in t.files()} == {e.path for e in t.files(v1)}
    # the undone merge stays time-travelable
    assert t.snapshot(v_merge).operation == "merge"
    assert key_state(t, version=v_merge) != before


def test_rollback_preserves_mor_delete_scoping(spark, tmp_path):
    """The invariant rollback must not break: an equality-delete file shadows
    only LOWER-seq data files. Restamping seqs on the carried-back entries
    would un-shadow (or re-shadow) rows; the resolved scan after rollback
    must be bit-identical to the target snapshot's resolved scan."""
    t = fresh_table(spark, tmp_path)
    merge_into_table_mor(t, cb(spark, 0))
    v_pending = t.head_version()
    state_pending = key_state(t)
    assert t.snapshot().summary["delete_files"] > 0  # deletes still pending

    apply_deletes(t)
    assert t.snapshot().summary["delete_files"] == 0

    t.rollback(v_pending)
    snap = t.snapshot()
    assert snap.summary["delete_files"] > 0  # pending deletes restored
    assert key_state(t) == state_pending
    # seq numbers are the target's own, not restamped to the rollback commit
    assert {(e.path, e.seq) for e in t.files()} == {
        (e.path, e.seq) for e in t.files(v_pending)
    }
    # and a later MoR merge on the restored state still behaves (replay guard
    # intact): identical replay is a no-op on row content
    merge_into_table_mor(t, cb(spark, 0))
    assert key_state(t) == state_pending


def test_rollback_restores_schema(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    v1 = t.head_version()
    old_fields = set(t.schema().fieldNames())
    from pyspark.sql import types as T

    evolved = T.StructType(
        list(MERGED_IMAGE_SCHEMA.fields) + [T.StructField("extra", T.StringType())]
    )
    t.evolve_schema(evolved, strategy="merge")
    assert "extra" in t.schema().fieldNames()
    t.rollback(v1)
    assert set(t.schema().fieldNames()) == old_fields


def test_rollback_to_head_is_noop(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    head = t.head_version()
    assert t.rollback(head) == head
    assert t.head_version() == head


def test_rollback_after_vacuum_fails_loudly(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    v1 = t.head_version()
    merge_into_table(t, cb(spark, 0), target_rows_per_file=100)
    expire_snapshots(t, keep_last=1)  # physically deletes v1-only files
    with pytest.raises(FileNotFoundError, match="rollback"):
        t.rollback(v1)


def test_restore_cli(spark, tmp_path, capsys):
    import json

    table = str(tmp_path / "images")
    base_pq = str(tmp_path / "base.parquet")
    batch_pq = str(tmp_path / "batch.parquet")
    generate_images(spark, 60, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    ).write.parquet(base_pq)
    generate_change_batch(
        spark, 60, batch_index=0, updates=10, inserts=5, deletes=5, num_partitions=4
    ).write.parquet(batch_pq)

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    run("init", "--table", table)
    v1 = run("ingest", "--table", table, "--batch", base_pq, "--num-files", "4")[
        "version"
    ]
    run("merge", "--table", table, "--batch", batch_pq)
    out = run("restore", "--table", table, "--version", str(v1))
    assert out["restored_version"] == v1
    t = IcepackTable.load(spark, table)
    assert t.snapshot().operation == "rollback"
    assert t.count_rows() == 60

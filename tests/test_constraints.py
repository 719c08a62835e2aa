"""CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT parity): validated
against existing data on add, enforced on every data write (append /
overwrite / CoW merge / MoR merge), SQL-standard NULL-passes semantics,
skipped for maintenance rewrites and key-only tombstone files, carried by
the summary merge, and restored by rollback."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datastream_deltalake_connector_spark.jobs import main
from datastream_deltalake_connector_spark.operators.compaction import compact
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
from datastream_deltalake_connector_spark.table import ConstraintViolation, IcepackTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("note", T.StringType()),
    ]
)


def make_df(spark, lo, hi, note="ok"):
    return spark.range(lo, hi).select(
        F.format_string("k%05d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
        F.lit(note).alias("note"),
    )


def test_add_enforce_drop_lifecycle(spark, tmp_path):
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(make_df(spark, 0, 50))
    v = t.add_check_constraint("v_nonneg", "v >= 0")
    assert t.snapshot(v).operation == "set-constraint"
    assert t.check_constraints() == {"v_nonneg": "v >= 0"}

    # clean batch passes; violating batch is rejected BEFORE any file lands
    t.append(make_df(spark, 50, 80))
    files_before = {e.path for e in t.files()}
    head_before = t.head_version()
    bad = make_df(spark, 0, 5).withColumn("v", F.lit(-1).cast("long"))
    with pytest.raises(ConstraintViolation, match="v_nonneg"):
        t.append(bad)
    assert t.head_version() == head_before
    assert {e.path for e in t.files()} == files_before

    t.drop_check_constraint("v_nonneg")
    t.append(bad)  # now allowed
    assert t.scan().filter("v < 0").count() == 5
    with pytest.raises(ValueError, match="no such constraint"):
        t.drop_check_constraint("v_nonneg")


def test_add_rejects_preexisting_violations_and_dupes(spark, tmp_path):
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(make_df(spark, 0, 20).withColumn("v", F.col("v") - 10))
    with pytest.raises(ConstraintViolation, match="existing data"):
        t.add_check_constraint("v_nonneg", "v >= 0")
    t.add_check_constraint("v_big", "v >= -10")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check_constraint("v_big", "v >= -10")
    # analysis errors (typo'd column) are loud, not a silent no-op
    with pytest.raises(Exception, match="no_such|UNRESOLVED|cannot be resolved"):
        t.add_check_constraint("broken", "no_such_col > 0")


def test_null_passes_sql_standard(spark, tmp_path):
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.add_check_constraint("note_short", "length(note) < 10")
    nulls = make_df(spark, 0, 5).withColumn("note", F.lit(None).cast("string"))
    t.append(nulls)  # NULL -> unknown -> passes (SQL standard CHECK)
    assert t.count_rows() == 5
    with pytest.raises(ConstraintViolation):
        t.append(make_df(spark, 5, 6, note="waaaaaay too long"))


def fresh_image_table(spark, tmp_path):
    t = IcepackTable.create(spark, str(tmp_path / "img"), MERGED_IMAGE_SCHEMA)
    base = generate_images(spark, 80, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    )
    t.append(base, num_files=4)
    return t


def test_merge_paths_enforce_and_maintenance_skips(spark, tmp_path):
    t = fresh_image_table(spark, tmp_path)
    t.add_check_constraint("w_pos", "w > 0")
    batch = generate_change_batch(
        spark, 80, batch_index=0, updates=10, inserts=5, deletes=5, num_partitions=4
    )
    # clean CoW merge passes, violating one is rejected atomically
    merge_into_table(t, batch, target_rows_per_file=50)
    head = t.head_version()
    bad = generate_change_batch(
        spark, 80, batch_index=1, updates=5, inserts=5, deletes=0, num_partitions=4
    ).withColumn("w", F.lit(-3))
    with pytest.raises(ConstraintViolation, match="w_pos"):
        merge_into_table(t, bad, target_rows_per_file=50)
    assert t.head_version() == head
    with pytest.raises(ConstraintViolation, match="w_pos"):
        merge_into_table_mor(t, bad)
    assert t.head_version() == head
    # MoR merge writes key-only tombstones: the w_pos constraint must be
    # skipped for the delete file, enforced for the data files
    merge_into_table_mor(
        t,
        generate_change_batch(
            spark, 80, batch_index=2, updates=5, inserts=0, deletes=5,
            num_partitions=4,
        ),
    )
    # maintenance rewrites already-validated rows without re-scanning
    apply_deletes(t)
    compact(t, target_bytes=1 << 22)
    assert t.check_constraints() == {"w_pos": "w > 0"}


def test_rollback_restores_constraint_set(spark, tmp_path):
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(make_df(spark, 0, 10))
    v_before = t.head_version()
    t.add_check_constraint("v_nonneg", "v >= 0")
    t.rollback(v_before)
    assert t.check_constraints() == {}  # constraint added later rolls back
    bad = make_df(spark, 0, 2).withColumn("v", F.lit(-1).cast("long"))
    t.append(bad)  # and is no longer enforced


def test_constraint_cli(spark, tmp_path, capsys):
    root = str(tmp_path / "t")
    t = IcepackTable.create(spark, root, SCHEMA)
    t.append(make_df(spark, 0, 10))

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("constraint", "--table", root, "--add", "v_nonneg", "v >= 0")
    assert out["constraints"] == {"v_nonneg": "v >= 0"}
    out = run("constraint", "--table", root, "--list")
    assert out["constraints"] == {"v_nonneg": "v >= 0"}
    out = run("constraint", "--table", root, "--drop", "v_nonneg")
    assert out["constraints"] == {}

"""SHALLOW CLONE (Delta CREATE TABLE SHALLOW CLONE parity): zero-copy
creation, full independence of the two version lines, constraint carry-over,
MoR correctness on the clone's fresh seq line, progressive localization by
maintenance, and — the safety property — the clone's expiry NEVER deletes
source-owned files."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datastream_deltalake_connector_spark.jobs import main
from datastream_deltalake_connector_spark.operators.changes import table_changes
from datastream_deltalake_connector_spark.operators.compaction import compact
from datastream_deltalake_connector_spark.operators.expire import expire_snapshots
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

N_BASE = 100


def fresh_table(spark, tmp_path, name="src", num_files=5):
    t = IcepackTable.create(spark, str(tmp_path / name), MERGED_IMAGE_SCHEMA)
    base = generate_images(spark, N_BASE, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    )
    t.append(base, num_files=num_files)
    return t


def key_state(t):
    return sorted(
        (r["image_id"], r["caption"], r["phash"])
        for r in t.scan().select("image_id", "caption", "phash").collect()
    )


def cb(spark, i, **kw):
    kw.setdefault("updates", 15)
    kw.setdefault("inserts", 8)
    kw.setdefault("deletes", 6)
    return generate_change_batch(spark, N_BASE, batch_index=i, num_partitions=4, **kw)


def local_data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        out.extend(f for f in files if f.endswith(".parquet"))
    return out


def test_clone_is_zero_copy_and_reads_identically(spark, tmp_path):
    src = fresh_table(spark, tmp_path)
    c = src.clone(str(tmp_path / "dst"))
    assert key_state(c) == key_state(src)
    assert local_data_files(c.root) == []  # not one byte copied
    snap = c.snapshot()
    assert snap.operation == "clone"
    assert snap.summary["cloned_from"] == os.path.abspath(src.root)
    assert snap.summary["cloned_version"] == src.head_version()
    # every cloned entry: absolute source path, seq re-stamped to 1
    assert all(os.path.isabs(e.path) and e.seq == 1 for e in c.files())
    # and the clone's change feed sees its first commit as pure inserts
    feed = table_changes(c, 0)
    assert feed.count() == N_BASE
    assert {r["_change_type"] for r in feed.select("_change_type").collect()} == {
        "insert"
    }


def test_clone_and_source_evolve_independently(spark, tmp_path):
    src = fresh_table(spark, tmp_path)
    c = src.clone(str(tmp_path / "dst"))
    before = key_state(src)

    merge_into_table(c, cb(spark, 0), key="image_id", target_rows_per_file=50)
    assert key_state(src) == before  # source untouched by clone writes
    assert key_state(c) != before

    merge_into_table(src, cb(spark, 1), key="image_id", target_rows_per_file=50)
    c_state = key_state(c)
    assert key_state(c) == c_state  # source writes invisible to the clone


def test_mor_merge_on_clone_shadows_cloned_files(spark, tmp_path):
    """The seq-restamp contract: a MoR delete file committed in the clone
    (seq >= 2) must shadow the cloned data files (seq 1)."""
    src = fresh_table(spark, tmp_path)
    c = src.clone(str(tmp_path / "dst"))
    merge_into_table_mor(c, cb(spark, 0))
    # resolved scan hides deleted keys even though their rows physically
    # live in SOURCE-owned files the clone never rewrote
    twin = fresh_table(spark, tmp_path, name="twin")
    merge_into_table(twin, cb(spark, 0), target_rows_per_file=50)
    assert key_state(c) == key_state(twin)
    apply_deletes(c)
    assert key_state(c) == key_state(twin)
    assert key_state(src) != key_state(c)  # source untouched throughout


def test_clone_refuses_pending_deletes(spark, tmp_path):
    src = fresh_table(spark, tmp_path)
    merge_into_table_mor(src, cb(spark, 0))
    assert src.snapshot().summary["delete_files"] > 0
    with pytest.raises(ValueError, match="pending delete files"):
        src.clone(str(tmp_path / "dst"))
    apply_deletes(src)
    src.clone(str(tmp_path / "dst"))  # now fine


def test_clone_expiry_never_deletes_source_files(spark, tmp_path):
    """THE safety property: compaction localizes the clone, the referenced
    source files become unreachable in the clone's history, and expiry must
    drop them from manifests WITHOUT unlinking them."""
    src = fresh_table(spark, tmp_path)
    c = src.clone(str(tmp_path / "dst"))
    compact(c, target_bytes=1 << 30)  # rewrites everything locally
    assert all(not os.path.isabs(e.path) for e in c.files())
    report = expire_snapshots(c, keep_last=1)
    assert report["n_external_skipped"] > 0
    assert all(not os.path.isabs(p) for p in report["deleted_files"])
    # source is fully intact and scannable
    assert src.scan().count() == N_BASE
    assert len(key_state(src)) == N_BASE
    # and the clone still reads its local copy
    assert len(key_state(c)) == N_BASE


def test_clone_carries_constraints(spark, tmp_path):
    src = fresh_table(spark, tmp_path)
    src.add_check_constraint("w_pos", "w > 0")
    c = src.clone(str(tmp_path / "dst"))
    assert c.check_constraints() == {"w_pos": "w > 0"}
    from datastream_deltalake_connector_spark.table import ConstraintViolation

    bad = cb(spark, 0, deletes=0).withColumn("w", F.lit(-1))
    with pytest.raises(ConstraintViolation):
        merge_into_table(c, bad, key="image_id")


def test_clone_cli(spark, tmp_path, capsys):
    src = fresh_table(spark, tmp_path)
    dest = str(tmp_path / "dst")

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("clone", "--table", src.root, "--dest", dest)
    assert out["rows"] == N_BASE
    assert out["cloned_version"] == src.head_version()
    assert IcepackTable.load(spark, dest).count_rows() == N_BASE

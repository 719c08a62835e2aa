"""Branches, tags, and write-audit-publish (Iceberg refs parity): named
pointers in metadata/refs.json over the globally-numbered snapshot line.
Branch views commit without moving main; tags pin retention; fast_forward
is the WAP publish with an ancestry precondition; change feeds and time
travel follow parent chains, never raw version ints."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.operators.changes import table_changes
from datastream_deltalake_connector_spark.operators.expire import expire_snapshots
from datastream_deltalake_connector_spark.operators.rowops import delete_where
from datastream_deltalake_connector_spark.table import ConflictError, IcepackTable


def base_table(spark, tmp_path, name="refs"):
    df = spark.range(0, 100).select("id", (F.col("id") * 2.0).alias("v"))
    t = IcepackTable.create(spark, str(tmp_path / name), df.schema)
    t.append(df, num_files=2)
    return t


def more(spark, lo, hi):
    return spark.range(lo, hi).select("id", (F.col("id") * 2.0).alias("v"))


def test_branch_commits_isolated_from_main(spark, tmp_path):
    t = base_table(spark, tmp_path)
    v1 = t.head_version()
    t.create_branch("audit")
    bt = t.branch("audit")
    bt.append(more(spark, 100, 150), num_files=1)
    bt.append(more(spark, 150, 160), num_files=1)
    assert t.scan().count() == 100  # main untouched
    assert bt.scan().count() == 160
    assert t.scan(ref="audit").count() == 160  # named-ref read from main view
    assert t.head_version() == v1
    assert t.refs()["branches"]["audit"] > v1
    # parent chain of the branch head reaches main's head
    v = bt.head_version()
    seen = []
    while v is not None:
        seen.append(v)
        v = t.snapshot(v).parent
    assert v1 in seen


def test_global_version_allocation_no_collision(spark, tmp_path):
    t = base_table(spark, tmp_path)
    t.create_branch("b")
    bt = t.branch("b")
    vb = bt.append(more(spark, 100, 110), num_files=1)
    vm = t.append(more(spark, 200, 210), num_files=1)
    assert vb != vm
    # both histories readable, each line sees only its own rows
    assert bt.scan().count() == 110
    assert t.scan().count() == 110
    assert t.scan(version=vb).count() == 110
    got_main = {r.id for r in t.scan().select("id").collect()}
    assert 205 in got_main and 105 not in got_main


def test_wap_publish_fast_forward(spark, tmp_path):
    """The full write-audit-publish loop."""
    t = base_table(spark, tmp_path)
    t.create_branch("wap")
    bt = t.branch("wap")
    bt.append(more(spark, 100, 120), num_files=1)
    delete_where(bt, [("id", "<", 10)])  # row-level op through the branch view
    # audit on the branch
    assert bt.scan().count() == 110
    # publish
    v = t.fast_forward("wap")
    assert t.head_version() == v
    assert t.scan().count() == 110
    t.drop_branch("wap")
    with pytest.raises(KeyError):
        t.branch("wap")
    with pytest.raises(KeyError):
        t.scan(ref="wap")


def test_fast_forward_requires_ancestry(spark, tmp_path):
    t = base_table(spark, tmp_path)
    t.create_branch("stale")
    bt = t.branch("stale")
    bt.append(more(spark, 100, 110), num_files=1)
    t.append(more(spark, 200, 210), num_files=1)  # main advanced underneath
    with pytest.raises(ConflictError, match="not an ancestor"):
        t.fast_forward("stale")
    # noop publish of an un-advanced branch is fine
    t.create_branch("fresh")
    assert t.fast_forward("fresh") == t.head_version()


def test_tag_pins_expiry_and_stays_readable(spark, tmp_path):
    t = base_table(spark, tmp_path)
    v1 = t.head_version()
    t.create_tag("training-run-7")
    for i in range(5):
        t.append(more(spark, 100 + i * 10, 110 + i * 10), num_files=1)
    future = int(time.time() * 1000) + 3_600_000  # everything "old enough"
    rep = expire_snapshots(t, keep_last=1, older_than_ms=future)
    assert rep["n_expired_snapshots"] > 0  # the policy did bite
    assert v1 not in rep["expired_snapshots"]
    assert t.scan(ref="training-run-7").count() == 100
    # dropping the tag releases it
    t.drop_tag("training-run-7")
    rep2 = expire_snapshots(t, keep_last=1, older_than_ms=future)
    assert v1 in rep2["expired_snapshots"]


def test_ref_name_validation_and_uniqueness(spark, tmp_path):
    t = base_table(spark, tmp_path)
    for bad in ("", "main", "a/b"):
        with pytest.raises(ValueError):
            t.create_branch(bad)
    t.create_branch("x")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("x")
    with pytest.raises(KeyError):
        t.drop_branch("never-existed")


def test_change_feed_follows_parent_chain(spark, tmp_path):
    """Branch commits interleaved into the global version line must not
    leak into main's change feed, and a cross-branch feed is refused."""
    t = base_table(spark, tmp_path)
    v1 = t.head_version()
    t.create_branch("noise")
    bt = t.branch("noise")
    bt.append(more(spark, 500, 600), num_files=1)  # global v2, off-main
    t.append(more(spark, 100, 105), num_files=1)  # main head, parent v1
    feed = table_changes(t, v1)
    got = sorted(r.id for r in feed.collect())
    assert got == list(range(100, 105))  # branch rows absent
    with pytest.raises(ValueError, match="not an ancestor"):
        table_changes(bt, t.head_version())


def test_timestamp_time_travel_ignores_other_branches(spark, tmp_path):
    t = base_table(spark, tmp_path)
    t.create_branch("b")
    bt = t.branch("b")
    vb = bt.append(more(spark, 500, 600), num_files=1)
    ts_b = t.snapshot(vb).timestamp_ms
    # main's floor at the branch commit's timestamp is main's head, never vb
    assert t.version_as_of(ts_b) == t.head_version()
    assert bt.version_as_of(ts_b) == vb


def test_branch_view_maintenance_ops_work(spark, tmp_path):
    """The whole IcepackTable surface resolves through head_version(), so
    rollback/describe/history on a branch view operate on the branch."""
    t = base_table(spark, tmp_path)
    t.create_branch("m")
    bt = t.branch("m")
    v_base = bt.head_version()
    bt.append(more(spark, 100, 120), num_files=1)
    bt.rollback(v_base)
    assert bt.scan().count() == 100
    assert t.refs()["branches"]["m"] == bt.head_version()
    assert bt.snapshot().operation == "rollback"
    assert t.scan().count() == 100  # main never moved

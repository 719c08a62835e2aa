"""COPY INTO: idempotent batch file loading (operators/copy_into.py).

The load-exactly-once ledger contract under every failure mode that
matters: rerun after success (skip all), new files arriving (load only
them), crash between ledger write and commit (reload — debris is inert),
history expiry (retained fold-in — no duplicate reload), FORCE (explicit
duplicates), format/pattern/alignment mechanics, and the SQL form.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from datastream_deltalake_connector_spark.operators.copy_into import (
    copy_into,
    loaded_file_keys,
)
from datastream_deltalake_connector_spark.operators.expire import expire_snapshots
from datastream_deltalake_connector_spark.sql import IcepackSQL, SqlDialectError
from datastream_deltalake_connector_spark.table.catalog import Catalog
from datastream_deltalake_connector_spark.table.icepack import IcepackTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    return IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)


def _drop_files(spark, dest, lo, hi, name):
    df = spark.range(lo, hi).selectExpr("id", "cast(id as double) as v")
    p = os.path.join(dest, name)
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_copy_into_idempotent_rerun(spark, table, tmp_path):
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 100, "a")
    rep1 = copy_into(table, src)
    assert rep1["rows_loaded"] == 100 and rep1["files_skipped_already_loaded"] == 0
    rep2 = copy_into(table, src)
    assert rep2["version"] is None and rep2["files_loaded"] == 0
    assert rep2["files_skipped_already_loaded"] == rep1["files_loaded"]
    assert table.scan().count() == 100


def test_copy_into_incremental_new_files(spark, table, tmp_path):
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 100, "a")
    copy_into(table, src)
    _drop_files(spark, src, 100, 150, "b")
    rep = copy_into(table, src)
    assert rep["rows_loaded"] == 50
    assert table.scan().count() == 150
    # every row exactly once
    assert table.scan().select("id").distinct().count() == 150


def test_copy_into_force_reloads(spark, table, tmp_path):
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 10, "a")
    copy_into(table, src)
    rep = copy_into(table, src, force=True)
    assert rep["rows_loaded"] == 10
    assert table.scan().count() == 20  # duplicates are the caller's intent


def test_copy_into_pattern(spark, table, tmp_path):
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 10, "keep_a")
    _drop_files(spark, src, 10, 20, "skip_b")
    rep = copy_into(table, src, pattern="keep_*/*")
    assert rep["rows_loaded"] == 10
    assert {r.id for r in table.scan().collect()} == set(range(10))


def test_orphan_ledger_is_inert(spark, table, tmp_path):
    """A ledger written by a crashed (never-committed) copy must NOT mark
    its files as loaded — counting it would silently drop data."""
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 10, "a")
    d = os.path.join(table.meta_dir, "copy")
    os.makedirs(d, exist_ok=True)
    from datastream_deltalake_connector_spark.operators.copy_into import _key

    files = []
    for root, _dd, names in os.walk(src):
        for n in names:
            if not n.startswith((".", "_")):
                p = os.path.join(root, n)
                files.append(_key(p, os.stat(p)))
    with open(os.path.join(d, "copy-deadbeef.json"), "w") as f:
        json.dump({"files": files, "src": src}, f)
    assert loaded_file_keys(table) == set()  # unreferenced -> ignored
    rep = copy_into(table, src)
    assert rep["rows_loaded"] == 10


def test_ledger_survives_snapshot_expiry(spark, table, tmp_path):
    """Expiring the copy commit's snapshot folds its ledger into
    copy-retained.json — a rerun after retention must still skip."""
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 10, "a")
    copy_into(table, src)
    keys_before = loaded_file_keys(table)
    # push the copy snapshot out of retention with fresh commits
    for i in range(3):
        table.append(
            spark.range(100 + i, 101 + i).selectExpr(
                "id", "cast(id as double) as v"
            )
        )
    rep = expire_snapshots(table, keep_last=2)
    assert rep["n_expired_snapshots"] > 0
    assert loaded_file_keys(table) == keys_before  # folded, not lost
    assert os.path.exists(os.path.join(table.meta_dir, "copy-retained.json"))
    rep = copy_into(table, src)
    assert rep["version"] is None and rep["files_loaded"] == 0


def test_copy_into_schema_alignment(spark, table, tmp_path):
    """Extra source columns ignored, missing target columns null-filled,
    types cast to the declaration."""
    src = str(tmp_path / "drop")
    spark.range(0, 5).selectExpr(
        "cast(id as int) as id", "id * 10 as extra"
    ).coalesce(1).write.parquet(os.path.join(src, "a"))
    rep = copy_into(table, src)
    assert rep["rows_loaded"] == 5
    rows = table.scan().orderBy("id").collect()
    assert [(r.id, r.v) for r in rows] == [(i, None) for i in range(5)]
    assert table.snapshot().schema == SCHEMA


def test_copy_into_csv_and_bad_format(spark, table, tmp_path):
    src = str(tmp_path / "csvdrop")
    os.makedirs(src)
    with open(os.path.join(src, "part1.csv"), "w") as f:
        f.write("id,v\n1,1.5\n2,2.5\n")
    rep = copy_into(table, src, file_format="csv")
    assert rep["rows_loaded"] == 2
    assert {(r.id, r.v) for r in table.scan().collect()} == {(1, 1.5), (2, 2.5)}
    with pytest.raises(ValueError):
        copy_into(table, src, file_format="orc")


def test_copy_into_sql_form(spark, tmp_path):
    sql = IcepackSQL(spark, Catalog(spark, str(tmp_path / "wh")))
    sql.execute("CREATE TABLE loads (id BIGINT, v DOUBLE)")
    src = str(tmp_path / "drop")
    spark.range(0, 20).selectExpr("id", "cast(id as double) as v").coalesce(
        1
    ).write.parquet(os.path.join(src, "a"))
    rep = sql.execute(f"COPY INTO loads FROM '{src}'").collect()[0]
    assert rep.rows_loaded == 20
    rep = sql.execute(f"COPY INTO loads FROM '{src}'").collect()[0]
    assert rep.files_loaded == 0 and rep.version is None
    rep = sql.execute(
        f"COPY INTO loads FROM '{src}' FILEFORMAT = PARQUET FORCE = TRUE"
    ).collect()[0]
    assert rep.rows_loaded == 20
    with pytest.raises(SqlDialectError):
        sql.execute("COPY INTO loads FROM missing_quotes")


def test_branch_copy_does_not_poison_main_ledger(spark, tmp_path):
    """A COPY that only ever landed on a (since-dropped) branch must not
    mark its files 'already loaded' for main — ledger reads walk the
    current ref's ancestry, not every snapshot on disk."""
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 25, "a")
    t.create_branch("audit")
    bv = t.branch("audit")
    rep = copy_into(bv, src)
    assert rep["rows_loaded"] == 25
    t.drop_branch("audit")  # orphan snapshots stay on disk
    assert t.scan().count() == 0  # main never saw the rows
    rep = copy_into(t, src)
    assert rep["rows_loaded"] == 25  # NOT falsely skipped
    assert t.scan().count() == 25


def test_appends_do_not_false_conflict_copy(spark, tmp_path):
    """Plain appends landing between the ledger read and the commit must
    NOT be misclassified as copy commits (summary inheritance) — COPY must
    rebase over them like any append-only concurrency."""
    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    src = str(tmp_path / "drop")
    _drop_files(spark, src, 0, 10, "a")
    copy_into(t, src)  # summary now carries copy_ledger at this version
    _drop_files(spark, src, 10, 20, "b")
    orig = IcepackTable.write_data_files
    fired = []

    def hooked(self, df, **kw):
        if not fired:
            fired.append(1)
            # a non-copy commit whose summary INHERITS from the copy commit
            t.append(
                spark.createDataFrame([(999, 0.0)], "id BIGINT, v DOUBLE")
            )
        return orig(self, df, **kw)

    IcepackTable.write_data_files = hooked
    try:
        rep = copy_into(t, src)
    finally:
        IcepackTable.write_data_files = orig
    assert rep["rows_loaded"] == 10  # landed beside the append, no starvation
    assert t.scan().count() == 21  # 10 copied + 1 appended + 10 copied


def test_copy_requirement_missing_snapshot_is_conflict(spark, tmp_path):
    """A hole punched in the parent chain by concurrent expiry surfaces as
    a retryable ConflictError, never a raw FileNotFoundError."""
    from datastream_deltalake_connector_spark.table.icepack import (
        ConflictError,
    )

    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    for i in range(3):
        t.append(
            spark.createDataFrame([(i, float(i))], "id BIGINT, v DOUBLE")
        )
    os.unlink(os.path.join(t.meta_dir, "snap-2.json"))
    with pytest.raises(ConflictError, match="expired mid-validation"):
        t.commit(
            "copy-into", added=[], removed_paths=[],
            requirements=[("no-new-copy-commits", 1)],
        )


def test_dropped_branch_commit_leaves_no_orphan_snapshot(spark, tmp_path):
    """A commit through a branch view whose branch was dropped must refuse
    BEFORE writing any snapshot metadata."""
    import glob

    from datastream_deltalake_connector_spark.table.icepack import (
        ConflictError,
    )

    t = IcepackTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(spark.createDataFrame([(1, 1.0)], "id BIGINT, v DOUBLE"))
    t.create_branch("b")
    bv = t.branch("b")
    t.drop_branch("b")
    n_before = len(glob.glob(os.path.join(t.meta_dir, "snap-*.json")))
    # the view may refuse at head resolution (KeyError) or, when the drop
    # lands later, at the commit's pre-write refs check (ConflictError) —
    # either way ZERO snapshot metadata may be written
    with pytest.raises((ConflictError, KeyError)):
        bv.append(spark.createDataFrame([(2, 2.0)], "id BIGINT, v DOUBLE"))
    assert len(glob.glob(os.path.join(t.meta_dir, "snap-*.json"))) == n_before
    # and the mid-commit window specifically: drive commit() directly with
    # a stale branch ref — the pre-write check must refuse cleanly
    t.create_branch("b2")
    bv2 = t.branch("b2")
    parent = bv2.head_version()
    t.drop_branch("b2")
    with pytest.raises(ConflictError, match="dropped"):
        bv2.commit("append", added=[], removed_paths=[], expected_parent=parent)
    assert len(glob.glob(os.path.join(t.meta_dir, "snap-*.json"))) == n_before

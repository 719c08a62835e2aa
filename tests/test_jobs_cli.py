"""spark-submit job entrypoint: every subcommand drives a real table
end-to-end through jobs.main() (the reference's DatastreamDeltaStreamingJob
analogue, jobs/DatastreamDeltaStreamingJob.scala:19-36)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.jobs import main
from datastream_deltalake_connector_spark.sources.generator import (
    generate_change_batch,
    generate_images,
)
from datastream_deltalake_connector_spark.table import IcepackTable


def run(capsys, *argv) -> dict:
    assert main(list(argv)) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_job_lifecycle(spark, tmp_path, capsys):
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

    assert run(capsys, "init", "--table", table)["version"] == 0
    assert run(capsys, "ingest", "--table", table, "--batch", base_pq, "--num-files", "5")[
        "version"
    ] == 1
    assert run(capsys, "merge", "--table", table, "--batch", batch_pq)["version"] == 2
    run(capsys, "compact", "--table", table, "--target-mb", "4")
    run(capsys, "cluster", "--table", table, "--curve", "zorder", "--num-files", "2")
    exp = run(capsys, "expire", "--table", table, "--keep-last", "1")
    assert exp["expired"]
    scan = run(capsys, "scan", "--table", table)
    assert scan["rows"] == 60  # 60 base + 5 inserts - 5 deletes
    t = IcepackTable.load(spark, table)
    assert t.head_version() == scan["version"]

    # policy/observability subcommands
    auto = run(capsys, "autocompact", "--table", table, "--min-num-files", "50")
    assert auto["version"] is None  # under threshold: no-op
    desc = run(capsys, "describe", "--table", table)
    assert desc["rows"] == 60 and desc["files"] == scan["files"]
    orph = run(capsys, "orphans", "--table", table, "--dry-run")
    assert orph["dry_run"] is True


def test_daemon_subcommand(spark, tmp_path, capsys):
    """`daemon` runs the resident connector under a bounded --duration and
    reports per-table health/targets; the merged table holds the dump."""
    root = tmp_path / "dumps"
    d = root / "people" / "2024" / "01" / "01" / "10" / "00"
    d.mkdir(parents=True)
    rec = {
        "uuid": "u1",
        "read_timestamp": "2024-01-01T10:00:01.000Z",
        "source_timestamp": "2024-01-01T10:00:01.000Z",
        "object": "demo.people",
        "read_method": "mysql-cdc-binlog",
        "stream_name": "s",
        "schema_key": "k0",
        "source_metadata": {
            "table": "people", "database": "demo", "primary_keys": ["pid"],
            "log_file": "b.1", "log_position": 100,
            "change_type": "INSERT", "is_deleted": False,
        },
        "payload": {"pid": "p1", "name": "ada", "city": "berlin"},
    }
    (d / "r1.json").write_text(json.dumps([rec]))
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"read_format": "json", "merge_frequency": "2 seconds"}))
    warehouse = str(tmp_path / "wh")
    out = run(
        capsys, "daemon", "--root", str(root), "--warehouse", warehouse,
        "--config", str(cfg), "--duration", "30",
    )
    assert out["failures"] == {}
    assert out["health"] == {"people": 2}  # sampled BEFORE stop()
    assert "people" in out["targets"]
    merged = IcepackTable.load(spark, out["targets"]["people"])
    assert merged.scan().count() == 1


def test_job_merge_mor_and_apply_deletes(spark, tmp_path, capsys):
    """merge --mode mor lands equality deletes via the CLI; describe shows
    the pending delete file; apply-deletes --if-needed respects thresholds
    and the unconditional run pays the rewrite and restores delete_files=0,
    with the scan identical to what the CoW path would produce."""
    table = str(tmp_path / "images-mor")
    base_pq = str(tmp_path / "base.parquet")
    batch_pq = str(tmp_path / "batch.parquet")
    generate_images(spark, 40, num_partitions=2).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    ).write.parquet(base_pq)
    generate_change_batch(
        spark, 40, batch_index=0, updates=8, inserts=4, deletes=4, num_partitions=2
    ).write.parquet(batch_pq)

    run(capsys, "init", "--table", table)
    run(capsys, "ingest", "--table", table, "--batch", base_pq, "--num-files", "4")
    out = run(capsys, "merge", "--table", table, "--batch", batch_pq, "--mode", "mor")
    assert out["version"] is not None
    desc = run(capsys, "describe", "--table", table)
    assert desc["delete_files"] >= 1

    # thresholds not met (1 pending delete file < 8, low tombstone ratio
    # over 40 rows would trip the ratio gate, so raise it) → no-op
    noop = run(
        capsys, "apply-deletes", "--table", table, "--if-needed",
        "--max-delete-files", "8", "--max-delete-ratio", "0.9",
    )
    assert noop["version"] is None
    paid = run(capsys, "apply-deletes", "--table", table)
    assert paid["version"] is not None
    desc = run(capsys, "describe", "--table", table)
    assert desc["delete_files"] == 0
    scan = run(capsys, "scan", "--table", table)
    assert scan["rows"] == 40  # 40 base + 4 inserts - 4 deletes


def test_job_init_bloom_cols(spark, tmp_path, capsys):
    """init --bloom-cols image_id: every ingested file carries the key
    bloom (describe bloom_files) and a MoR merge's candidate pruning uses
    it (candidate_files well under the file count on the hash layout)."""
    table = str(tmp_path / "images-bloom")
    base_pq = str(tmp_path / "bb.parquet")
    batch_pq = str(tmp_path / "bbatch.parquet")
    generate_images(spark, 400, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    ).write.parquet(base_pq)
    generate_change_batch(
        spark, 400, batch_index=0, updates=3, inserts=0, deletes=0, num_partitions=1
    ).write.parquet(batch_pq)

    run(capsys, "init", "--table", table, "--bloom-cols", "image_id")
    run(capsys, "ingest", "--table", table, "--batch", base_pq, "--num-files", "16")
    desc = run(capsys, "describe", "--table", table)
    assert desc["bloom_files"] == desc["files"] == 16
    run(capsys, "merge", "--table", table, "--batch", batch_pq, "--mode", "mor")
    from datastream_deltalake_connector_spark.table import IcepackTable

    t = IcepackTable.load(spark, table)
    assert t.snapshot().summary["candidate_files"] <= 6  # pruned, not 16
    scan = run(capsys, "scan", "--table", table)
    assert scan["rows"] == 400


def test_job_branch_wap_and_rowops(spark, tmp_path, capsys):
    """branch/tag/publish + delete/update verbs drive the WAP loop and
    predicate row-level ops end-to-end from the CLI."""
    table = str(tmp_path / "wap_images")
    base_pq = str(tmp_path / "wap_base.parquet")
    batch_pq = str(tmp_path / "wap_batch.parquet")
    generate_images(spark, 40, num_partitions=4).select(
        "*",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias(
            "datastream_metadata_source_timestamp"
        ),
        F.lit(0).cast("long").alias("datastream_metadata_change_seq"),
    ).write.parquet(base_pq)
    generate_change_batch(
        spark, 40, batch_index=0, updates=8, inserts=4, deletes=4, num_partitions=4
    ).write.parquet(batch_pq)

    run(capsys, "init", "--table", table)
    run(capsys, "ingest", "--table", table, "--batch", base_pq, "--num-files", "4")
    t = IcepackTable.load(spark, table)
    v_main = t.head_version()
    n_main = t.count_rows()

    # cut a branch, merge into it, main untouched
    br = run(capsys, "branch", "--table", table, "--create", "wap")
    assert br["version"] == v_main and "wap" in br["refs"]["branches"]
    bt = t.branch("wap")
    from datastream_deltalake_connector_spark.operators.table_merge import (
        merge_into_table,
    )

    merge_into_table(bt, spark.read.parquet(batch_pq), key="image_id")
    assert t.head_version() == v_main and t.count_rows() == n_main

    # tag the pre-publish main, then publish
    v_branch = bt.head_version()
    run(capsys, "tag", "--table", table, "--create", "prepub")
    pub = run(capsys, "publish", "--table", table, "--branch", "wap")
    assert pub["version"] == v_branch == t.head_version()
    assert "wap" not in t.refs()["branches"]  # dropped by default
    assert t.scan(ref="prepub").count() == n_main
    scan = run(capsys, "scan", "--table", table, "--ref", "prepub")
    assert scan["rows"] == n_main and scan["version"] == v_main

    # predicate delete + update through the CLI
    ids = sorted(r.image_id for r in t.scan().select("image_id").limit(3).collect())
    rep = run(
        capsys, "delete", "--table", table,
        "--where", f"image_id = '{ids[0]}'",
        "--filters", json.dumps([["image_id", "=", ids[0]]]),
    )
    assert rep["rows_deleted"] == 1 and rep["files_pruned"] >= 0
    upd = run(
        capsys, "update", "--table", table,
        "--set", json.dumps({"caption": "upper(caption)"}),
        "--where", f"image_id = '{ids[1]}'",
        "--filters", json.dumps([["image_id", "=", ids[1]]]),
    )
    assert upd["rows_updated"] == 1
    got = t.scan(filters=[("image_id", "=", ids[1])]).select("caption").collect()
    assert got[0].caption == got[0].caption.upper()


def test_job_sql_subcommand(spark, tmp_path, capsys):
    """The sql subcommand runs dialect statements against a warehouse:
    DDL + DML + MERGE + SELECT round-trip entirely through text."""
    wh = str(tmp_path / "wh")
    run(capsys, "sql", "--warehouse", wh, "--execute",
        "CREATE TABLE kv (k BIGINT, v STRING)")
    run(capsys, "sql", "--warehouse", wh, "--execute",
        "INSERT INTO kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    run(capsys, "sql", "--warehouse", wh, "--execute",
        "UPDATE kv SET v = upper(v) WHERE k >= 2")
    run(capsys, "sql", "--warehouse", wh, "--execute",
        "DELETE FROM kv WHERE k = 1")
    out = run(capsys, "sql", "--warehouse", wh, "--execute",
              "SELECT k, v FROM kv ORDER BY k")
    assert out["rows"] == [{"k": 2, "v": "B"}, {"k": 3, "v": "C"}]
    assert out["truncated"] is False
    # export path + truncation flag
    dest = str(tmp_path / "export.parquet")
    out = run(capsys, "sql", "--warehouse", wh, "--execute",
              "SELECT k, v FROM kv ORDER BY k", "--out", dest, "--limit", "1")
    assert out["truncated"] is True and len(out["rows"]) == 1
    assert spark.read.parquet(dest).count() == 2

"""CDC source layer + Structured Streaming ingest, end-to-end.

Ports the reference's fixture strategy (spark/src/test/resources/tables/
<table>/<yyyy>/<MM>/<dd>/<HH>/<mm>/records*.json with the Datastream
envelope of events/schema.json) with original fixture data, and drives the
two-stream pipeline: file dumps → log table → merged icepack snapshot.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.sources.cdc import (
    DatastreamTable,
    TableMetadata,
    discover_tables,
    flatten_envelope,
    read_table_batch,
)
from datastream_deltalake_connector_spark.streaming.ingest import run_connector_once
from datastream_deltalake_connector_spark.table import IcepackTable


def envelope(uid, ts, pk, name, city, change_type="INSERT", deleted=False,
             log_file="mysql-bin.000001", log_position=100, read_method="mysql-cdc-binlog"):
    return {
        "uuid": f"test-uuid-{uid}",
        "read_timestamp": ts,
        "source_timestamp": ts,
        "object": "demo.people",
        "read_method": read_method,
        "stream_name": "projects/0/locations/local/streams/test",
        "schema_key": "k0",
        "source_metadata": {
            "table": "people",
            "database": "demo",
            "primary_keys": ["pid"],
            "log_file": log_file,
            "log_position": log_position,
            "change_type": change_type,
            "is_deleted": deleted,
        },
        "payload": {"pid": pk, "name": name, "city": city},
    }


@pytest.fixture(scope="module")
def stream_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dumps")
    d1 = root / "people" / "2024" / "01" / "01" / "10" / "00"
    d2 = root / "people" / "2024" / "01" / "01" / "10" / "05"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    batch1 = [
        envelope(1, "2024-01-01T10:00:01.000Z", "p1", "ada", "berlin", log_position=100),
        envelope(2, "2024-01-01T10:00:02.000Z", "p2", "grace", "paris", log_position=110),
        envelope(3, "2024-01-01T10:00:03.000Z", "p3", "alan", "london", log_position=120),
        # same key twice in one dump: later log_position wins
        envelope(4, "2024-01-01T10:00:03.000Z", "p3", "alan t", "cambridge", "UPDATE-INSERT", log_position=130),
    ]
    batch2 = [
        # newer update for p1
        envelope(5, "2024-01-01T10:05:01.000Z", "p1", "ada l", "zurich", "UPDATE-INSERT", log_position=200),
        # stale event for p2 (older ts than the existing row) → discarded
        envelope(6, "2024-01-01T09:59:00.000Z", "p2", "stale", "nowhere", "UPDATE-INSERT", log_position=90),
        # delete p3
        envelope(7, "2024-01-01T10:05:02.000Z", "p3", "alan t", "cambridge", "DELETE", True, log_position=210),
        # delete of an absent key → no-op
        envelope(8, "2024-01-01T10:05:03.000Z", "p9", "ghost", "x", "DELETE", True, log_position=220),
    ]
    (d1 / "records1.json").write_text(json.dumps(batch1))
    (d2 / "records2.json").write_text(json.dumps(batch2))
    return str(root)


def test_discovery(stream_root):
    tables = discover_tables(stream_root)
    assert [t.table for t in tables] == ["people"]
    assert tables[0].table_path == os.path.join(stream_root, "people")
    assert discover_tables("/nonexistent-root") == []


def test_batch_read_and_metadata(spark, stream_root):
    t = DatastreamTable(stream_root, "people")
    df = read_table_batch(spark, t, "json")
    assert df.count() == 8
    meta = TableMetadata.from_df(df)
    assert meta.source_type == "mysql"
    assert meta.table == "people"
    assert meta.database == "demo"
    assert meta.primary_keys == ["pid"]
    assert meta.order_by[0] == "source_timestamp"
    assert sorted(meta.payload_fields) == ["city", "name", "pid"]
    # empty batch → None (ST6)
    assert TableMetadata.from_df(df.where(F.lit(False))) is None


def test_flatten_envelope_ordering(spark, stream_root):
    t = DatastreamTable(stream_root, "people")
    df = read_table_batch(spark, t, "json")
    meta = TableMetadata.from_df(df)
    flat = flatten_envelope(df, meta)
    assert set(flat.columns) == {
        "pid", "name", "city", "change_type", "is_deleted",
        "source_timestamp", "change_seq",
    }
    rows = {(r["pid"], r["change_seq"]): r for r in flat.collect()}
    # log_file suffix packed above log_position: file 1, pos 130
    assert ((1 << 32) + 130) in [seq for (_, seq) in rows]
    deleted = [r for r in rows.values() if r["is_deleted"]]
    assert {r["pid"] for r in deleted} == {"p3", "p9"}


def test_format_dispatch_errors(spark, stream_root):
    # avro now works (tests/test_avro.py); pointing it at JSON dumps must
    # fail loudly on the container magic, and unknown formats are rejected
    with pytest.raises(ValueError):
        read_table_batch(spark, DatastreamTable(stream_root, "people"), "avro")
    with pytest.raises(ValueError):
        read_table_batch(spark, DatastreamTable(stream_root, "people"), "orc2")


def test_streaming_connector_end_to_end(spark, stream_root, tmp_path):
    warehouse = str(tmp_path / "warehouse")
    results = run_connector_once(spark, stream_root, warehouse, fmt="json")
    assert "people" in results

    merged = IcepackTable.load(spark, results["people"])
    rows = {
        r["pid"]: r
        for r in merged.scan().select("pid", "name", "city").collect()
    }
    # golden outcome of the two dumps under reference merge semantics:
    assert rows == {
        "p1": rows["p1"],  # structure check below
        "p2": rows["p2"],
        # p3 deleted, p9 never inserted
    }
    assert set(rows) == {"p1", "p2"}
    assert (rows["p1"]["name"], rows["p1"]["city"]) == ("ada l", "zurich")
    assert (rows["p2"]["name"], rows["p2"]["city"]) == ("grace", "paris")

    # log table holds the full append-only history
    log = spark.read.parquet(os.path.join(warehouse, "people_log"))
    assert log.count() == 8

    # resumability: draining again with the same checkpoints is a no-op
    # (no new files), and the merged table is unchanged
    v_before = merged.head_version()
    results2 = run_connector_once(spark, stream_root, warehouse, fmt="json")
    merged2 = IcepackTable.load(spark, results2["people"])
    assert {
        (r["pid"], r["name"]) for r in merged2.scan().select("pid", "name").collect()
    } == {("p1", "ada l"), ("p2", "grace")}


def test_streaming_new_dump_incremental(spark, stream_root, tmp_path):
    """A third dump arriving later is picked up incrementally by the same
    checkpointed queries (the reference's resident-stream behavior, run here
    as successive availableNow drains)."""
    warehouse = str(tmp_path / "warehouse2")
    run_connector_once(spark, stream_root, warehouse, fmt="json")

    d3 = os.path.join(stream_root, "people", "2024", "01", "01", "10", "10")
    os.makedirs(d3, exist_ok=True)
    with open(os.path.join(d3, "records3.json"), "w") as f:
        json.dump(
            [
                envelope(9, "2024-01-01T10:10:00.000Z", "p2", "grace h", "oslo",
                         "UPDATE-INSERT", log_position=300),
                envelope(10, "2024-01-01T10:10:01.000Z", "p4", "new kid", "rome",
                         log_position=310),
            ],
            f,
        )
    try:
        results = run_connector_once(spark, stream_root, warehouse, fmt="json")
        merged = IcepackTable.load(spark, results["people"])
        rows = {
            r["pid"]: (r["name"], r["city"])
            for r in merged.scan().select("pid", "name", "city").collect()
        }
        assert rows == {
            "p1": ("ada l", "zurich"),
            "p2": ("grace h", "oslo"),
            "p4": ("new kid", "rome"),
        }
    finally:
        # leave the module-scoped fixture as the earlier tests expect
        import shutil

        shutil.rmtree(d3, ignore_errors=True)


def test_table_source_seam_local_and_gcs(stream_root):
    """TableSource protocol: local impl matches discover_tables; the GCS impl
    pages an injected fake client exactly like the reference's mockable
    GCSOpsSpec (GCSOpsSpec.scala:13-15)."""
    from datastream_deltalake_connector_spark.sources.discovery import (
        GCSTableSource,
        LocalTableSource,
        TableSource,
    )

    local = LocalTableSource(stream_root)
    assert isinstance(local, TableSource)
    assert [t.table for t in local.list_tables()] == ["people"]

    class FakeGCSClient:
        """Two pages; blob names include nested dump paths and a stray
        prefix-level object that must not become a table."""

        def __init__(self):
            self.calls = []

        def list_blobs(self, bucket, prefix, page_token):
            self.calls.append((bucket, prefix, page_token))
            assert bucket == "b" and prefix == "streams/s1/"
            if page_token is None:
                return (
                    [
                        "streams/s1/people/2024/01/01/10/00/records1.avro",
                        "streams/s1/accounts/2024/01/01/10/00/records1.avro",
                    ],
                    "page-2",
                )
            assert page_token == "page-2"
            return (["streams/s1/people/2024/01/01/10/05/records2.avro"], None)

    client = FakeGCSClient()
    src = GCSTableSource(client, "b", "streams/s1")
    tables = src.list_tables()
    assert [t.table for t in tables] == ["accounts", "people"]
    assert tables[0].path == "gs://b/streams/s1"
    assert len(client.calls) == 2  # followed the page token


def test_google_cloud_client_adapter_paging(stream_root):
    """GoogleCloudGCSClient translates the official client's iterator/pages
    shape into the (names, token) protocol — tested against a duck-typed
    stand-in of google.cloud.storage.Client (the real lib is optional), and
    make_table_source dispatches local|gcs from config."""
    from datastream_deltalake_connector_spark.config import ConnectorConfig
    from datastream_deltalake_connector_spark.sources.discovery import (
        GCSClientProtocol,
        GCSTableSource,
        GoogleCloudGCSClient,
        LocalTableSource,
        make_table_source,
    )

    class FakeBlob:
        def __init__(self, name):
            self.name = name

    class FakeHTTPIterator:
        """Mimics google.api_core.page_iterator.HTTPIterator: .pages yields
        one page per fetch; next_page_token is set after a page is read."""

        def __init__(self, pages, tokens):
            self._pages, self._tokens = pages, tokens
            self.next_page_token = None

        @property
        def pages(self):
            def gen():
                for page, tok in zip(self._pages, self._tokens):
                    self.next_page_token = tok
                    yield [FakeBlob(n) for n in page]

            return gen()

    class FakeStorageClient:
        def __init__(self):
            self.calls = []

        def list_blobs(self, bucket, prefix=None, page_token=None):
            self.calls.append((bucket, prefix, page_token))
            if page_token is None:
                return FakeHTTPIterator(
                    [["s/t1/2024/01/01/10/00/r1.avro", "s/t2/2024/01/01/10/00/r1.avro"]],
                    ["tok-2"],
                )
            assert page_token == "tok-2"
            return FakeHTTPIterator([["s/t3/2024/01/01/10/05/r2.avro"]], [None])

    fake = FakeStorageClient()
    adapter = GoogleCloudGCSClient(client=fake)
    assert isinstance(adapter, GCSClientProtocol)
    names, tok = adapter.list_blobs("b", "s/", None)
    assert names == ["s/t1/2024/01/01/10/00/r1.avro", "s/t2/2024/01/01/10/00/r1.avro"]
    assert tok == "tok-2"
    names, tok = adapter.list_blobs("b", "s/", "tok-2")
    assert (names, tok) == (["s/t3/2024/01/01/10/05/r2.avro"], None)

    # the adapter drives the SAME paging walk as the fake-client spec
    src = GCSTableSource(GoogleCloudGCSClient(client=FakeStorageClient()), "b", "s")
    assert [t.table for t in src.list_tables()] == ["t1", "t2", "t3"]

    # config dispatch: local needs a root; gcs needs a bucket
    cfg = ConnectorConfig(table_source="local")
    assert isinstance(make_table_source(cfg, stream_root), LocalTableSource)
    with pytest.raises(ValueError, match="requires stream_root"):
        make_table_source(cfg)
    with pytest.raises(ValueError, match="requires bucket"):
        make_table_source(ConnectorConfig(table_source="gcs"))


def test_run_connector_accepts_table_source(spark, stream_root, tmp_path):
    """The connector runs against an explicit TableSource (seam used instead
    of the default local lister)."""
    from datastream_deltalake_connector_spark.sources.discovery import LocalTableSource

    warehouse = str(tmp_path / "seam-warehouse")
    results = run_connector_once(
        spark, "ignored-root", warehouse, fmt="json",
        table_source=LocalTableSource(stream_root),
    )
    assert "people" in results


def test_ingest_microbatch_partitions_bounds_files(spark, stream_root, tmp_path):
    """The DELTA_MICROBATCH_PARTITIONS analogue: with microbatch_partitions=1
    each micro-batch coalesces to ONE log file, so a drain of N triggers
    leaves ≤N data files — the reference's documented small-file mitigation
    (README.md:115, Config.scala:51-54)."""
    import glob as g

    from datastream_deltalake_connector_spark.streaming.ingest import (
        ingest_table_to_log,
    )

    table = DatastreamTable(stream_root, "people")
    for knob, bound in ((None, 100), (1, 2)):
        log_dir = str(tmp_path / f"log-{knob}")
        ckpt = str(tmp_path / f"ckpt-{knob}")
        q = ingest_table_to_log(
            spark, table, log_dir, ckpt, "json",
            max_files_per_trigger=1,  # 2 dump files → 2 triggers
            microbatch_partitions=knob,
        )
        q.awaitTermination()
        files = g.glob(os.path.join(log_dir, "part-*"))
        assert 1 <= len(files) <= bound
        if knob == 1:
            assert len(files) <= 2  # one file per trigger, two triggers
        assert spark.read.parquet(log_dir).count() == 8


def test_streaming_auto_compact_in_sink(spark, tmp_path):
    """autoCompact parity (reference application.conf:38-45 + Databricks
    post-write compaction): with auto_compact_min_files set, the merge sink
    chains maybe_compact after each merged batch. Batches carry DISJOINT
    key ranges so manifest pruning leaves earlier files untouched — the
    pure small-file-accumulation case autoCompact exists for (overlapping
    batches self-compact through the merge rewrite)."""
    from datastream_deltalake_connector_spark.streaming.ingest import (
        ingest_table_to_log,
        merge_log_to_table,
        _load_or_create_target,
    )

    root = tmp_path / "dumps-ac"
    for minute, (k1, k2) in zip(("00", "05", "10"), (("a1", "a2"), ("m1", "m2"), ("z1", "z2"))):
        d = root / "people" / "2024" / "01" / "01" / "10" / minute
        d.mkdir(parents=True)
        recs = [
            envelope(int(minute) * 10 + i, f"2024-01-01T10:{minute}:0{i}.000Z", k, f"n-{k}", f"c-{k}")
            for i, k in enumerate((k1, k2), start=1)
        ]
        (d / "records.json").write_text(json.dumps(recs))

    table = DatastreamTable(str(root), "people")
    meta = TableMetadata.from_df(read_table_batch(spark, table, "json"))
    warehouse = str(tmp_path / "wh-ac")
    log_dir = os.path.join(warehouse, "people_log")
    ckpt = os.path.join(warehouse, "_ck")
    q1 = ingest_table_to_log(
        spark, table, log_dir, ckpt, "json",
        max_files_per_trigger=1, microbatch_partitions=1,
    )
    q1.awaitTermination()
    t, merged_root = _load_or_create_target(spark, warehouse, "people", meta)
    q2 = merge_log_to_table(
        spark, log_dir, t, ckpt, meta, auto_compact_min_files=3,
        max_files_per_trigger=1,  # one merge batch per log file
    )
    q2.awaitTermination()
    assert any(
        s.operation == "compact" for s in t.snapshots()
    ), "sink never auto-compacted"
    assert len(t.files()) < 3  # three insert-only batches collapsed
    rows = {r["pid"]: r["city"] for r in t.scan().select("pid", "city").collect()}
    assert rows == {k: f"c-{k}" for k in ("a1", "a2", "m1", "m2", "z1", "z2")}


def test_daemon_await_returns_immediately_with_no_queries(spark, tmp_path):
    """Zero supervised queries (empty discovery root / every table failed
    setup) + timeout=None must NOT busy-loop forever: await_any_termination
    returns None immediately so callers can inspect .failures (r3 advice)."""
    import time

    from datastream_deltalake_connector_spark.streaming.ingest import ConnectorDaemon

    root = tmp_path / "empty-root"
    root.mkdir()
    daemon = ConnectorDaemon(spark, str(root), str(tmp_path / "wh-empty")).start()
    assert daemon.queries == {}
    t0 = time.time()
    assert daemon.await_any_termination() is None  # timeout=None
    assert time.time() - t0 < 5
    daemon.stop()


def test_merge_log_requires_schema_on_empty_dir(spark, tmp_path):
    """Starting the merge stream on a missing/empty log dir without an
    explicit log_schema must raise a clear contract error (not Spark's
    AnalysisException), and must create the dir first (r3 advice)."""
    import pytest

    from datastream_deltalake_connector_spark.streaming.ingest import merge_log_to_table

    log_dir = str(tmp_path / "wh-nolog" / "people_log")
    with pytest.raises(ValueError, match="log_schema"):
        merge_log_to_table(
            spark, log_dir, target=None, checkpoint_dir=str(tmp_path / "ck"), meta=None
        )
    assert os.path.isdir(log_dir)  # makedirs happened before inference


def test_connector_daemon_runtime_isolation(spark, tmp_path):
    """Daemon mode (reference awaitAnyTermination parity, but supervised):
    two tables' continuous streams run; poisoning ONE table's log at runtime
    fails only that table — the healthy table keeps committing new dumps —
    and stop() shuts everything down cleanly."""
    import time

    from datastream_deltalake_connector_spark.streaming.ingest import ConnectorDaemon

    root = tmp_path / "dumps"
    for tbl in ("alpha", "beta"):
        d = root / tbl / "2024" / "01" / "01" / "10" / "00"
        d.mkdir(parents=True)
        recs = [envelope(1, "2024-01-01T10:00:01.000Z", "p1", "ada", "berlin")]
        (d / "records1.json").write_text(json.dumps(recs))
    warehouse = str(tmp_path / "wh")
    daemon = ConnectorDaemon(
        spark, str(root), warehouse, processing_time=None
    ).start()
    try:
        assert set(daemon.queries) == {"alpha", "beta"}
        assert daemon.failures == {}

        def merged_count(tbl: str) -> int:
            try:
                t = IcepackTable.load(spark, daemon.targets[tbl])
                return t.scan().count()
            except Exception:
                return -1

        def wait_for(cond, timeout=120):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if cond():
                    return True
                time.sleep(0.5)
            return False

        assert wait_for(
            lambda: merged_count("alpha") == 1 and merged_count("beta") == 1
        ), "initial dumps never reached the merged tables"

        # poison beta at RUNTIME (not setup): delete the merged table's
        # HEAD pointer, then feed a new dump — every merge batch re-resolves
        # metadata/HEAD, so beta's next batch raises and its merge stream
        # dies while both ingest streams and alpha stay healthy.
        # (Dropping a rogue file into the log dir would NOT work: the log is
        # written by a streaming sink, so the downstream stream trusts the
        # sink's _spark_metadata log and ignores unlisted files. Deleting
        # committed DATA files doesn't work either — an insert-only batch
        # manifest-prunes them and never reads a byte.)
        beta_head = os.path.join(daemon.targets["beta"], "metadata", "HEAD")
        beta_head_txt = open(beta_head).read()
        os.remove(beta_head)
        d_poison = root / "beta" / "2024" / "01" / "01" / "10" / "05"
        d_poison.mkdir(parents=True)
        (d_poison / "records2.json").write_text(
            json.dumps([envelope(3, "2024-01-01T10:05:02.000Z", "p3", "linus", "oslo")])
        )
        assert wait_for(lambda: daemon.poll()["beta"] < 2), "poison not detected"
        assert "beta" in daemon.failures
        assert daemon.failures["beta"].startswith("runtime:")

        # the healthy table keeps committing after beta's failure
        d2 = root / "alpha" / "2024" / "01" / "01" / "10" / "05"
        d2.mkdir(parents=True)
        (d2 / "records2.json").write_text(
            json.dumps([envelope(2, "2024-01-01T10:05:01.000Z", "p2", "grace", "paris")])
        )
        assert wait_for(lambda: merged_count("alpha") == 2), (
            "healthy table stopped committing after sibling failure"
        )
        assert daemon.poll()["alpha"] == 2  # both alpha streams still live
        assert daemon.await_any_termination(timeout=5) == "beta"

        # recovery: repair the broken table (restore the HEAD pointer; the
        # snapshots and data files were never touched), restart beta via
        # start_table — the merge stream resumes from its checkpoint and
        # applies exactly the batch it died on (p3), on top of the already-
        # committed p1. Nothing is re-ingested, nothing is double-applied.
        with open(beta_head, "w") as f:
            f.write(beta_head_txt)
        for q in daemon.queries["beta"]:
            if q.isActive:
                q.stop()
        tables = {t.table: t for t in daemon.table_source.list_tables()}
        daemon.start_table(tables["beta"])
        assert daemon.failures.get("beta") is None
        assert wait_for(lambda: merged_count("beta") == 2), (
            "restarted table did not catch up from its checkpointed log"
        )
    finally:
        daemon.stop()
    assert not daemon.active()


def test_connector_daemon_sixteen_tables_mixed_poisoning(spark, tmp_path):
    """Daemon breadth (ST7 at fan-out): 16 tables → exactly 32 supervised
    streams (O(tables) state), all merging; poisoning 4 tables at runtime
    fails exactly those 4 — one poll() reaps them in <2 s — while the other
    12 keep 2 live streams each and keep committing new dumps."""
    import time

    from datastream_deltalake_connector_spark.streaming.ingest import ConnectorDaemon

    names = [f"t{i:02d}" for i in range(16)]
    root = tmp_path / "dumps16"
    for tbl in names:
        d = root / tbl / "2024" / "01" / "01" / "10" / "00"
        d.mkdir(parents=True)
        (d / "r1.json").write_text(
            json.dumps([envelope(1, "2024-01-01T10:00:01.000Z", "p1", "ada", "berlin")])
        )
    daemon = ConnectorDaemon(
        spark, str(root), str(tmp_path / "wh16"), processing_time=None
    ).start()
    try:
        assert set(daemon.queries) == set(names)
        assert daemon.failures == {}
        # O(tables) supervision state: exactly two streams per table
        assert all(len(qs) == 2 for qs in daemon.queries.values())

        def merged_count(tbl: str) -> int:
            try:
                return IcepackTable.load(spark, daemon.targets[tbl]).scan().count()
            except Exception:
                return -1

        def wait_for(cond, timeout=300):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if cond():
                    return True
                time.sleep(0.5)
            return False

        assert wait_for(lambda: all(merged_count(t) == 1 for t in names)), (
            "initial dumps never reached all 16 merged tables"
        )
        assert daemon.poll() == {t: 2 for t in names}

        # poison every 4th table at runtime (see the 2-table test for why
        # deleting HEAD + feeding a dump is the only working poison)
        poisoned = names[::4]
        for tbl in poisoned:
            os.remove(os.path.join(daemon.targets[tbl], "metadata", "HEAD"))
            d = root / tbl / "2024" / "01" / "01" / "10" / "05"
            d.mkdir(parents=True)
            (d / "r2.json").write_text(
                json.dumps([envelope(2, "2024-01-01T10:05:01.000Z", "p2", "bad", "bad")])
            )
        dead = daemon.await_any_termination(timeout=180)
        assert dead in poisoned
        # wait for the remaining poisoned merge streams to die, WITHOUT
        # poll() (merge stream is qs[1]) — then a single poll must reap
        # all four at once, fast (reap is bookkeeping, never a Spark job)
        assert wait_for(
            lambda: all(not daemon.queries[t][1].isActive for t in poisoned),
            timeout=180,
        ), "poisoned merge streams did not all terminate"
        t0 = time.time()
        health = daemon.poll()
        assert time.time() - t0 < 2.0, "poll() reap took a Spark-job-scale pause"
        assert set(daemon.failures) == set(poisoned)
        assert all(daemon.failures[t].startswith("runtime:") for t in poisoned)
        assert health == {t: (1 if t in poisoned else 2) for t in names}

        # breadth isolation: healthy tables still commit new dumps
        fresh = [t for t in names if t not in poisoned][:4]
        for tbl in fresh:
            d = root / tbl / "2024" / "01" / "01" / "10" / "05"
            d.mkdir(parents=True)
            (d / "r2.json").write_text(
                json.dumps([envelope(2, "2024-01-01T10:05:01.000Z", "p2", "grace", "oslo")])
            )
        assert wait_for(lambda: all(merged_count(t) == 2 for t in fresh)), (
            "healthy tables stopped committing after sibling failures"
        )
    finally:
        daemon.stop()
    assert not daemon.active()


def test_streaming_connector_merge_on_read_mode(spark, stream_root, tmp_path):
    """merge_mode='mor' end-to-end: the same two-dump CDC drain, one merge
    batch per log file (batch 2 then hits rows batch 1 committed), lands
    merge-on-read (operators/mor.py) — O(batch) writes + equality-delete
    tombstones — and the resolved scan must match the CoW golden outcome
    exactly. With mor_max_delete_files=1 the sink's maybe_apply_deletes
    chain fires once tombstones exist, so the drain ends with the deferred
    rewrite paid and zero pending delete files."""
    from datastream_deltalake_connector_spark.streaming.ingest import (
        _load_or_create_target,
        ingest_table_to_log,
        merge_log_to_table,
    )

    table = DatastreamTable(stream_root, "people")
    meta = TableMetadata.from_df(read_table_batch(spark, table, "json"))
    warehouse = str(tmp_path / "warehouse-mor")
    log_dir = os.path.join(warehouse, "people_log")
    ckpt = os.path.join(warehouse, "_ck")
    q1 = ingest_table_to_log(
        spark, table, log_dir, ckpt, "json",
        max_files_per_trigger=1, microbatch_partitions=1,
    )
    q1.awaitTermination()
    t, merged_root = _load_or_create_target(spark, warehouse, "people", meta)
    q2 = merge_log_to_table(
        spark, log_dir, t, ckpt, meta,
        max_files_per_trigger=1,  # one merge batch per log file
        merge_mode="mor", mor_max_delete_files=1,
    )
    q2.awaitTermination()

    # the MoR path actually ran (not silently CoW)
    ops = [s.operation for s in t.snapshots()]
    assert "merge-mor" in ops
    # batch 2 carries updates+deletes against rows batch 1 committed →
    # tombstones were written, and max_delete_files=1 applied them in-sink
    assert "apply-deletes" in ops
    assert t.describe()["delete_files"] == 0

    # golden outcome identical to the CoW e2e test: p1 updated, stale p2
    # discarded, p3 deleted, ghost-delete no-op
    rows = {
        r["pid"]: (r["name"], r["city"])
        for r in t.scan().select("pid", "name", "city").collect()
    }
    assert rows == {"p1": ("ada l", "zurich"), "p2": ("grace", "paris")}

    # replay the drain: checkpoints make it a no-op, table unchanged
    v = t.head_version()
    q3 = merge_log_to_table(
        spark, log_dir, t, ckpt, meta,
        max_files_per_trigger=1, merge_mode="mor", mor_max_delete_files=1,
    )
    q3.awaitTermination()
    assert t.head_version() == v


def test_merge_log_rejects_unknown_merge_mode(spark, tmp_path):
    from datastream_deltalake_connector_spark.streaming.ingest import (
        merge_log_to_table,
    )

    with pytest.raises(ValueError, match="merge_mode"):
        merge_log_to_table(
            spark, str(tmp_path / "nolog"), None, str(tmp_path / "ck"),
            None, merge_mode="sideways",
        )


def test_connector_bloom_filters_end_to_end(spark, stream_root, tmp_path):
    """DELTA_BLOOM_FILTERS plumbed through the whole pipeline: the connector
    creates the merged table with bloom_cols = primary keys, every merged
    data file carries the key's bloom, and the visible rows match the plain
    connector run exactly (bloom pruning is result-invariant)."""
    wh_b = str(tmp_path / "wh-bloom")
    wh_p = str(tmp_path / "wh-plain")
    res_b = run_connector_once(
        spark, stream_root, wh_b, fmt="json", bloom_filters=True
    )
    res_p = run_connector_once(spark, stream_root, wh_p, fmt="json")
    tb = IcepackTable.load(spark, res_b["people"])
    tp = IcepackTable.load(spark, res_p["people"])
    assert tb.bloom_cols() == ["pid"]
    assert all(
        e.stats.get("pid", {}).get("bloom")
        for e in tb.files()
        if e.content == "data"
    )
    state = lambda t: sorted(
        (r["pid"], r["name"], r["city"])
        for r in t.scan().select("pid", "name", "city").collect()
    )
    assert state(tb) == state(tp)

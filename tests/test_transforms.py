"""Hidden partitioning (Iceberg partition-transform parity,
table/transforms.py): day/month/hour/year, bucket(N), truncate(W) specs
derive hive layout from source columns at write time and prune files
driver-side from the per-file partition values — plus spec evolution with
mixed layouts co-existing, and conservative refusal everywhere a proof
doesn't hold."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.table import IcepackTable
from datastream_deltalake_connector_spark.table.transforms import (
    Transform,
    parse_spec,
    partition_may_match,
    transforms_for_keys,
)


def test_parse_spec_forms_and_errors():
    ts = parse_spec(["fmt", "day(ts)", "bucket(16, image_id)", "truncate(4,fmt)"])
    assert [(t.kind, t.col, t.arg) for t in ts] == [
        ("identity", "fmt", None),
        ("day", "ts", None),
        ("bucket", "image_id", 16),
        ("truncate", "fmt", 4),
    ]
    assert [t.pname for t in ts] == ["fmt", "ts_day", "image_id_bucket16", "fmt_truncate4"]
    for bad in ["bucket(image_id)", "bucket(0, x)", "day(3, ts)", "nope()", ""]:
        with pytest.raises(ValueError):
            parse_spec([bad])


def test_transform_values_and_reverse_parse():
    day = Transform("day", "ts")
    assert day.value("2024-03-05 17:30:00") == "2024-03-05"
    assert Transform("hour", "ts").value("2024-03-05 17:30:00") == "2024-03-05-17"
    assert Transform("month", "ts").value("2024-03-05") == "2024-03"
    assert Transform("year", "ts").value("2024-03-05") == "2024"
    b = Transform("bucket", "uid", 8)
    assert b.value("u17") == str(int(hashlib.md5(b"u17").hexdigest()[:8], 16) % 8)
    assert b.value(42) == str(int(hashlib.md5(b"42").hexdigest()[:8], 16) % 8)
    assert b.value(True) is None  # Spark casts bool to 'true', not 'True'
    assert Transform("truncate", "uid", 2).value("wxyz") == "wx"
    # reverse parse: file keys -> the transforms that wrote them
    tfs = transforms_for_keys(
        {"ts_day", "uid_bucket8", "fmt"}, {"ts", "uid", "fmt"}
    )
    assert {(t.kind, t.col, t.arg) for t in tfs} == {
        ("day", "ts", None),
        ("bucket", "uid", 8),
        ("identity", "fmt", None),
    }
    # a REAL column named like a transform shadows it (treated as identity)
    tfs2 = transforms_for_keys({"ts_day"}, {"ts", "ts_day"})
    assert [(t.kind, t.col) for t in tfs2] == [("identity", "ts_day")]
    # unknown source column: ignored entirely
    assert transforms_for_keys({"ghost_day"}, {"ts"}) == []


def test_partition_may_match_proofs():
    tfs = parse_spec(["day(ts)", "bucket(4, uid)", "truncate(2, uid)"])
    part = {"ts_day": "2024-01-05", "uid_bucket4": "2", "uid_truncate2": "ux"}
    pm = lambda c, op, v: partition_may_match(part, tfs, c, op, v)
    # day: monotone range pruning both directions
    assert pm("ts", "between", ("2024-01-05 00:00:00", "2024-01-06"))
    assert not pm("ts", "between", ("2024-01-06", "2024-01-07"))
    assert not pm("ts", "<", "2024-01-04 23:00:00")
    assert pm("ts", "<", "2024-01-05 01:00:00")
    assert not pm("ts", ">", "2024-01-06 00:00:00")
    # bucket: equality/in only — range never prunes. Probes share the 'ux'
    # prefix so the truncate key cannot veto; split them by true bucket.
    bkt = Transform("bucket", "uid", 4)
    probes = [f"ux{i}" for i in range(40)]
    hit = [p for p in probes if bkt.value(p) == "2"]
    miss = [p for p in probes if bkt.value(p) != "2"]
    assert hit and miss
    assert pm("uid", "=", hit[0])
    assert not pm("uid", "=", miss[0])
    assert pm("uid", "in", [miss[0], hit[0]])
    assert not pm("uid", "in", miss[:3])
    assert pm("uid", "<", "zzz")  # bucket must NOT range-prune
    # truncate: string prefix order is value order
    assert not pm("uid", "=", "uy123")  # prefix 'uy' != 'ux'
    assert not pm("uid", ">", "uz")  # every row starts 'ux' < 'uz'
    assert pm("uid", ">", "uw")
    # truncate refuses NUMERIC probes (string compare of numerics lies)
    tfn = parse_spec(["truncate(1, n)"])
    assert partition_may_match({"n_truncate1": "9"}, tfn, "n", "<", 10)
    # absent keys / unknown values: conservative keep
    assert partition_may_match({}, tfs, "ts", "=", "2024-01-05")
    assert pm("ts", "=", object())


def _table(spark, tmp_path, spec, name="hp"):
    df = spark.range(0, 200).select(
        "id",
        F.concat(F.lit("u"), F.col("id")).alias("uid"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(hours=F.col("id"))
        ).alias("ts"),
        (F.col("id") * 1.0).alias("v"),
    )
    t = IcepackTable.create(
        spark, str(tmp_path / name), df.schema, partition_by=spec
    )
    t.append(df)
    return t, df


def test_write_layout_and_pruning_end_to_end(spark, tmp_path):
    t, _ = _table(spark, tmp_path, ["day(ts)", "bucket(4, uid)"])
    fs = t.files()
    assert all({"ts_day", "uid_bucket4"} <= set(e.partition) for e in fs)
    # source columns stay in the files; derived ones never enter the schema
    assert set(t.schema().fieldNames()) == {"id", "uid", "ts", "v"}
    n_all = len(fs)
    eq = t.scan(filters=[("uid", "=", "u17")])
    assert eq.count() == 1 and len(eq.inputFiles()) < n_all / 2
    rng = t.scan(
        filters=[("ts", "between", ("2024-01-02 00:00:00", "2024-01-03 23:59:59"))]
    )
    assert rng.count() == 48  # 2 full days of hourly rows
    assert len(rng.inputFiles()) < n_all / 2
    # pruning is conservative: full scan unchanged
    assert t.scan().count() == 200


def test_day_boundary_exactness(spark, tmp_path):
    t, _ = _table(spark, tmp_path, ["day(ts)"], name="bound")
    # predicate exactly at a day boundary must keep the boundary day
    got = t.scan(filters=[("ts", ">=", "2024-01-02 00:00:00")]).count()
    assert got == 200 - 24
    got2 = t.scan(filters=[("ts", "<", "2024-01-02 00:00:00")]).count()
    assert got2 == 24


def test_spec_evolution_mixed_layouts(spark, tmp_path):
    t, df = _table(spark, tmp_path, ["day(ts)"], name="evolve")
    v_spec = t.set_partition_spec(["bucket(4, uid)"])
    assert t.snapshot(v_spec).operation == "set-partition-spec"
    t.append(df.withColumn("uid", F.concat(F.lit("w"), F.col("id"))))
    # both layouts live in one table; each file prunes by ITS OWN keys
    parts = {frozenset(e.partition) for e in t.files()}
    assert frozenset({"ts_day"}) in parts
    assert frozenset({"uid_bucket4"}) in parts
    assert t.scan().count() == 400
    eq = t.scan(filters=[("uid", "=", "w17")])
    assert eq.count() == 1
    # old-layout files can't bucket-prune but new-layout ones do
    assert len(eq.inputFiles()) < len(t.files())
    # stop partitioning entirely
    t.set_partition_spec(None)
    t.append(df.limit(5))
    assert any(not e.partition for e in t.files())
    assert t.scan().count() == 405


def test_create_validates_spec(spark, tmp_path):
    import pyspark.sql.types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="not in schema"):
        IcepackTable.create(
            spark, str(tmp_path / "bad1"), schema, partition_by=["day(ghost)"]
        )
    with pytest.raises(ValueError, match="positive width/count"):
        IcepackTable.create(
            spark, str(tmp_path / "bad2"), schema, partition_by=["bucket(a)"]
        )
    with pytest.raises(ValueError, match="unparseable"):
        IcepackTable.create(
            spark, str(tmp_path / "bad3"), schema, partition_by=["nope()"]
        )
    t = _table(spark, tmp_path, ["day(ts)"], name="evo-bad")[0]
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_spec(["bucket(8, ghost)"])


def test_identity_spec_unchanged_layout(spark, tmp_path):
    """Identity partitioning (pre-transform tables) keeps bare column dirs."""
    df = spark.createDataFrame(
        [(1, "png"), (2, "jpg"), (3, "png")], "id long, fmt string"
    )
    t = IcepackTable.create(
        spark, str(tmp_path / "ident"), df.schema, partition_by=["fmt"]
    )
    t.append(df)
    assert all(set(e.partition) == {"fmt"} for e in t.files())
    eq = t.scan(filters=[("fmt", "=", "jpg")])
    assert eq.count() == 1 and len(eq.inputFiles()) < len(t.files())


def test_maintenance_preserves_transform_partitions(spark, tmp_path):
    """Compaction groups bins by partition tuple — transform layouts
    survive a rewrite and keep pruning."""
    from datastream_deltalake_connector_spark.operators.compaction import compact

    t, _ = _table(spark, tmp_path, ["day(ts)"], name="maint")
    compact(t, target_bytes=64 * 1024 * 1024)
    assert all(set(e.partition) == {"ts_day"} for e in t.files())
    rng = t.scan(filters=[("ts", "<", "2024-01-02 00:00:00")])
    assert rng.count() == 24
    assert len(rng.inputFiles()) < len(t.files())

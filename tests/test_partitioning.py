"""Explicit range partitioning (operators/partitioning.py): the clustering
rewrite depends on (a) the bucket fold matching a plain searchsorted, (b) the
bucket→partition remap landing each bucket in its own shuffle partition —
the property that makes the pixel payload cross exactly one exchange."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.operators.partitioning import (
    bucket_expr,
    partition_remap,
    quantile_boundaries,
    repartition_by_bounds,
)


def test_bucket_expr_matches_searchsorted(spark):
    rng = np.random.default_rng(3)
    bounds = sorted(int(v) for v in rng.integers(-(2**40), 2**40, 31))
    keys = [int(v) for v in rng.integers(-(2**41), 2**41, 500)] + bounds
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = [
        r["b"]
        for r in df.select(bucket_expr(F.col("k"), bounds).alias("b"), "k")
        .orderBy("k")
        .collect()
    ]
    expect = np.searchsorted(bounds, sorted(keys), side="right").tolist()
    assert got == expect


def test_bucket_expr_two_level_matches_flat(spark):
    """Force the sqrt decomposition (>4096 bounds) and pin it to searchsorted."""
    import datastream_deltalake_connector_spark.operators.partitioning as P

    rng = np.random.default_rng(4)
    bounds = sorted(int(v) for v in rng.integers(0, 2**30, 5000))
    keys = [int(v) for v in rng.integers(-100, 2**30 + 100, 300)] + [
        bounds[0], bounds[-1], bounds[0] - 1, bounds[-1] + 1
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    assert len(bounds) > P._FLAT_FOLD_MAX
    got = {
        r["k"]: r["b"]
        for r in df.select("k", bucket_expr(F.col("k"), bounds).alias("b")).collect()
    }
    for k in keys:
        assert got[k] == int(np.searchsorted(bounds, k, side="right")), k


@pytest.mark.parametrize("n", [1, 7, 32])
def test_partition_remap_is_exact(spark, n):
    remap = partition_remap(spark, n)
    assert len(remap) == n
    df = spark.createDataFrame([(v, i) for i, v in enumerate(remap)], ["v", "want"])
    # remap values are searched (and used in production) as IntegerType —
    # murmur3 of an int differs from murmur3 of the same value as long
    df = df.withColumn("v", F.col("v").cast("int"))
    got = (
        df.repartition(n, F.col("v"))
        .withColumn("pid", F.spark_partition_id())
        .collect()
    )
    for r in got:
        assert r["pid"] == r["want"]


def test_repartition_by_bounds_one_bucket_per_file(spark, tmp_path):
    rng = np.random.default_rng(5)
    vals = [(int(v), f"row{i}") for i, v in enumerate(rng.integers(0, 10**6, 4000))]
    df = spark.createDataFrame(vals, ["key", "payload"])
    bounds = quantile_boundaries(df.select("key"), "key", 8)
    out = repartition_by_bounds(df, F.col("key"), bounds, key_col_name="__k")
    path = str(tmp_path / "ranged")
    out.write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 4000
    import glob as g

    files = sorted(g.glob(path + "/part-*.parquet"))
    assert len(files) == 8
    # per-file key ranges must be pairwise disjoint (allowing empty overlap
    # at quantile ties) and each file internally sorted
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).select("key").toPandas()
        if len(pdf):
            ks = pdf["key"].tolist()
            ranges.append((min(ks), max(ks)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_rewrite_sized_splits_sets_and_restores(spark):
    from datastream_deltalake_connector_spark.operators.partitioning import (
        rewrite_sized_splits,
    )

    conf_key = "spark.sql.files.maxPartitionBytes"
    before = spark.conf.get(conf_key)
    cores = spark.sparkContext.defaultParallelism
    # volume large enough that total/(2*cores) exceeds the 16 MB floor
    total = 2 * cores * 64 * 1024 * 1024
    with rewrite_sized_splits(spark, total):
        assert int(spark.conf.get(conf_key)) == 64 * 1024 * 1024
    assert spark.conf.get(conf_key) == before

    # tiny volume → floored at 16 MB, never raised above the session value
    with rewrite_sized_splits(spark, 1024):
        inside = spark.conf.get(conf_key)
        try:
            inside_bytes = int(str(inside).lower().removesuffix("b"))
        except ValueError:
            inside_bytes = None
        if inside_bytes is not None and inside_bytes > 16 * 1024 * 1024:
            # session value already <= floor keeps its own setting
            assert inside == before
        else:
            assert inside_bytes == 16 * 1024 * 1024 or inside == before
    assert spark.conf.get(conf_key) == before

    # restored even when the body raises
    try:
        with rewrite_sized_splits(spark, total):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(conf_key) == before

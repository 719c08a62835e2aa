"""Physical-plan shape guards: the properties PLANS.md *documents*, pinned
as tests so a refactor that silently adds a shuffle (or un-prunes a scan)
fails CI instead of only shifting a markdown report.

Plans are captured with AQE off (un-executed adaptive plans hide the final
operator chain); the counting convention matches scripts/audit_plans.py —
only the detail-section headers "(N) OperatorName" count, the tree section
repeats operators.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def plan_text(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def exchanges(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))


@pytest.fixture(scope="module")
def noaqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # other test modules may have cached a full-table read of the same
    # parquet paths; Spark substitutes the InMemoryRelation into ANY
    # matching scan, which would hide the real file-scan pruning
    spark.catalog.clearCache()
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_projection_queries_have_zero_shuffles(noaqe):
    for q in ("zorder_key", "pii_redact_docs", "chunk_docs", "hash_split_docs"):
        p = plan_text(noaqe, q)
        assert exchanges(p) == 0, f"{q} grew a shuffle:\n{p[:2000]}"


def test_single_shuffle_queries(noaqe):
    # one exchange each: groupBy on a derived key / the asof window
    for q in ("url_dedup_docs", "events_asof_join", "exact_dedup_docs"):
        p = plan_text(noaqe, q)
        assert exchanges(p) == 1, f"{q} expected exactly 1 exchange:\n{p[:2000]}"


def test_star_join_stays_broadcast(noaqe):
    p = plan_text(noaqe, "shipping_priority")
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.M)) >= 1
    assert "SortMergeJoin" not in p or "BroadcastHashJoin" in p
    # top-k must be per-partition heaps, not a global sort exchange
    assert "TakeOrderedAndProject" in p


def test_scan_projection_pruned(noaqe):
    # url dedup must never read the text column
    p = plan_text(noaqe, "url_dedup_docs")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    assert schemas and all("text" not in s for s in schemas), schemas


def test_generic_merge_single_join_write_job(noaqe, tmp_path):
    """The general MERGE writes through ONE join: clause routing, cascades,
    projections, and observe metrics all ride a single full-outer join over
    only the probe-hit files — a refactor that adds a second join or an
    extra exchange pair is a scale regression."""
    from pyspark.sql import types as T

    from datastream_deltalake_connector_spark.operators import generic_merge as gm
    from datastream_deltalake_connector_spark.table.icepack import IcepackTable

    t = IcepackTable.create(
        noaqe,
        str(tmp_path / "pm"),
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    for lo in (0, 100):
        t.append(
            noaqe.range(lo, lo + 100).selectExpr(
                "id", "cast(id as double) as v"
            ),
            num_files=1,
        )
    src = noaqe.createDataFrame([(5, 50.0), (250, 2.5)], "id BIGINT, v DOUBLE")
    captured = {}
    orig = IcepackTable.write_data_files

    def spy(self, df, **kw):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        captured["plan"] = buf.getvalue()
        return orig(self, df, **kw)

    IcepackTable.write_data_files = spy
    try:
        rep = gm.merge_into(
            t,
            src,
            "id",
            matched=[{"action": "update", "condition": None, "set": "*"}],
            not_matched=[{"action": "insert", "condition": None, "values": "*"}],
        )
    finally:
        IcepackTable.write_data_files = orig
    p = captured["plan"]
    joins = re.findall(r"^\(\d+\) (\w*Join\w*)", p, re.M)
    assert len(joins) == 1, f"expected ONE join, got {joins}:\n{p[:2000]}"
    scans = len(re.findall(r"^\(\d+\) Scan parquet", p, re.M))
    assert scans == 1, f"only the probe-hit file may be scanned, got {scans}"
    # SMJ costs its two exchange+sort pairs and nothing else
    assert exchanges(p) <= 2, f"unexpected extra exchange:\n{p[:2000]}"
    # the insert key (250) stretches the source bounds across both files so
    # range pre-pruning cannot engage — the EXACT file_path probe is what
    # bounds the rewrite to the single file actually holding a match
    assert rep["files_rewritten"] == 1 and rep["files_probed"] == 2

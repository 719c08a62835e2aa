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

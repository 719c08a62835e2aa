"""Training-pipeline operators: deterministic hash split/sample, corpus
vocabulary, benchmark decontamination, and sequence packing — invariants
pinned against brute-force python references at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datastream_deltalake_connector_spark.operators.decontaminate import (
    contamination_check,
)
from datastream_deltalake_connector_spark.operators.packing import pack_sequences
from datastream_deltalake_connector_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
)
from datastream_deltalake_connector_spark.operators.vocab import vocabulary

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_hash_bucket_matches_reference_md5(spark):
    df = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id"), 100, "s").alias("b")
        ).collect()
    }
    for i in range(50):
        h = hashlib.md5(f"{i}s".encode()).hexdigest()
        assert got[i] == int(h[:8], 16) % 100, f"bucket mismatch for id {i}"


def test_hash_split_total_and_disjoint(docs):
    out = hash_split(docs, weights={"train": 8, "val": 1, "test": 1}).cache()
    n = docs.count()
    assert out.count() == n  # every row assigned
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 80/10/10 within generous tolerance at n=500
    assert counts["train"] > 0.6 * n
    assert counts["val"] + counts["test"] < 0.4 * n
    # deterministic: same assignment on re-run
    again = {r["doc_id"]: r["split"] for r in hash_split(docs, weights={"train": 8, "val": 1, "test": 1}).collect()}
    for r in out.collect():
        assert again[r["doc_id"]] == r["split"]


def test_hash_sample_is_stable_subset(docs):
    s = hash_sample(docs, fraction_x10k=2000)
    ids = {r["doc_id"] for r in s.select("doc_id").collect()}
    n = docs.count()
    assert 0.05 < len(ids) / n < 0.45  # ~20% with slack at n=500
    # appending new rows never changes membership of old rows
    more = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    ids2 = {
        r["doc_id"]
        for r in hash_sample(docs.unionByName(more), fraction_x10k=2000)
        .select("doc_id")
        .collect()
    }
    assert ids == {i for i in ids2 if i < 1_000_000}


def test_vocabulary_matches_python_counter(docs):
    top = vocabulary(docs, top_n=50).collect()
    ref = Counter()
    for r in docs.select("text").collect():
        ref.update(t for t in r["text"].strip().lower().split() if t)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["token"], r["freq"]) for r in top]
    assert got == want


def test_contamination_finds_planted_overlap(spark, docs):
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    # plant: a training doc that IS a benchmark doc's text
    bench_row = bench.limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(999_999, bench_row["text"])], "doc_id long, text string"
    )
    hits = contamination_check(
        train.select("doc_id", "text").unionByName(planted), bench
    )
    by_id = {r["doc_id"]: r["n_hits"] for r in hits.collect()}
    assert 999_999 in by_id and by_id[999_999] > 0
    # benchmark docs themselves were excluded from the scanned side
    assert all(i % 97 != 0 or i == 999_999 for i in by_id)


def test_pack_sequences_invariants(docs):
    sized = docs.select("doc_id", F.length("text").alias("n_tokens"))
    packed = pack_sequences(sized, max_tokens=4096, num_groups=8).cache()
    rows = packed.collect()
    # every doc exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in sized.collect()
    )
    packs: dict[int, list] = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
    for pid, members in packs.items():
        total = sum(r["n_tokens"] for r in members)
        if any(r["oversize"] for r in members):
            assert len(members) == 1  # oversize docs pack alone
        else:
            assert total <= 4096, f"pack {pid} overflows: {total}"
            # offsets tile without overlap
            members.sort(key=lambda r: r["pack_offset"])
            pos = 0
            for r in members:
                assert r["pack_offset"] == pos
                pos += r["n_tokens"]
    # oversize flag exactly when n_tokens > max
    for r in rows:
        assert r["oversize"] == (r["n_tokens"] > 4096)
    # deterministic
    again = {r["doc_id"]: r["pack_id"] for r in pack_sequences(sized, max_tokens=4096, num_groups=8).collect()}
    assert {r["doc_id"]: r["pack_id"] for r in rows} == again


def test_pack_sequences_utilization(docs):
    sized = docs.select("doc_id", F.length("text").alias("n_tokens"))
    packed = pack_sequences(sized, max_tokens=4096, num_groups=8)
    agg = (
        packed.where(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("used"))
        .agg(F.sum("used").alias("tot"), F.count(F.lit(1)).alias("n_packs"))
        .collect()[0]
    )
    # FFD with hash-routed groups: waste bounded by ~1 slack bin per group
    util = agg["tot"] / (agg["n_packs"] * 4096)
    assert util > 0.5, f"utilization too low: {util:.2f}"


def test_dedup_segments_keeps_first_occurrence(spark):
    from datastream_deltalake_connector_spark.operators.text_dedup import (
        dedup_segments,
    )

    # doc 1 repeats doc 0's first segment ("a b c"); doc 2 repeats its own
    # segment internally; doc 3 is all boilerplate already seen -> vanishes
    rows = [
        (0, "a b c d e f"),
        (1, "a b c x y z"),
        (2, "p q r p q r"),
        (3, "a b c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_kept"], r["text_clean"])
        for r in dedup_segments(df, window_words=3).collect()
    }
    assert out[0] == (2, "a b c d e f")  # first occurrence keeps everything
    assert out[1] == (1, "x y z")  # lost the repeated head segment
    assert out[2] == (1, "p q r")  # intra-doc repeat collapses
    assert 3 not in out  # fully-duplicated doc is dropped entirely


def test_dedup_segments_matches_python_reference(docs):
    from datastream_deltalake_connector_spark.operators.text_dedup import (
        dedup_segments,
    )

    k = 3
    rows = sorted(
        (r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()
    )
    first: dict[str, tuple[int, int]] = {}
    segs: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in rows:
        words = text.split(" ")
        for j in range(0, (len(words) + k - 1) // k):
            s = " ".join(words[j * k : (j + 1) * k])
            segs.setdefault(doc_id, []).append((j, s))
            if s not in first or (doc_id, j) < first[s]:
                first[s] = (doc_id, j)
    want = {}
    for doc_id, lst in segs.items():
        kept = [s for j, s in lst if first[s] == (doc_id, j)]
        if kept:
            want[doc_id] = (len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_kept"], r["text_clean"])
        for r in dedup_segments(docs, window_words=k).collect()
    }
    assert got == want


def test_chunk_documents_boundaries(spark):
    from datastream_deltalake_connector_spark.operators.chunking import (
        chunk_documents,
    )

    text = "".join(chr(ord("a") + i % 26) for i in range(310))
    df = spark.createDataFrame([(7, text), (8, "xy")], ["doc_id", "text"])
    out = chunk_documents(df, window=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c7 = sorted(by_doc[7], key=lambda r: r["chunk_id"])
    # starts step by window-overlap=80; last start must add a new char
    assert [r["start"] for r in c7] == [0, 80, 160, 240]
    assert all(r["chunk"] == text[r["start"] : r["start"] + 100] for r in c7)
    # consecutive chunks share exactly the 20-char overlap
    assert c7[0]["chunk"][-20:] == c7[1]["chunk"][:20]
    assert c7[-1]["chunk_chars"] == 310 - 240
    # short doc -> single chunk, whole text
    (c8,) = by_doc[8]
    assert (c8["chunk"], c8["start"], c8["chunk_chars"]) == ("xy", 0, 2)

    with pytest.raises(ValueError):
        chunk_documents(df, window=100, overlap=100)


def test_chunk_documents_no_redundant_tail(spark):
    from datastream_deltalake_connector_spark.operators.chunking import (
        chunk_documents,
    )

    # doc of exactly `window` chars: one chunk only (a tail chunk at
    # start=step would be fully contained in the first)
    df = spark.createDataFrame([(1, "z" * 100)], ["doc_id", "text"])
    out = chunk_documents(df, window=100, overlap=20).collect()
    assert len(out) == 1 and out[0]["chunk_chars"] == 100


def test_repetition_metrics_known_counts(spark):
    from datastream_deltalake_connector_spark.operators.quality_filter import (
        repetition_metrics,
    )

    rows = [
        (0, "a b a b a"),      # bigrams: ab,ba,ab,ba -> top 2/4, dup 4/4
        (1, "x y z"),          # xy,yz -> top 1/2, dup 0
        (2, "solo"),           # < n words -> absent
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_metrics(df, n=2).collect()}
    assert got[0]["total_grams"] == 4
    assert got[0]["top_gram_count"] == 2
    assert got[0]["dup_gram_count"] == 4
    assert got[0]["top_gram_frac"] == 0.5
    assert got[0]["dup_gram_frac"] == 1.0
    assert got[1]["total_grams"] == 2 and got[1]["dup_gram_count"] == 0
    assert 2 not in got


def test_repetition_metrics_matches_python_reference(docs):
    from datastream_deltalake_connector_spark.operators.quality_filter import (
        repetition_metrics,
    )

    want = {}
    for r in docs.select("doc_id", "text").collect():
        ws = r["text"].split(" ")
        grams = [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        if not grams:
            continue
        c = Counter(grams)
        total = sum(c.values())
        dup = sum(v for v in c.values() if v > 1)
        want[r["doc_id"]] = (total, max(c.values()), dup)
    got = {
        r["doc_id"]: (r["total_grams"], r["top_gram_count"], r["dup_gram_count"])
        for r in repetition_metrics(docs, n=2).collect()
    }
    assert got == want


def test_cap_per_group_exact_and_deterministic(docs):
    from datastream_deltalake_connector_spark.operators.sampling import cap_per_group

    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out1 = sorted(
        (r["source"], r["doc_id"], r["rk"])
        for r in cap_per_group(docs, cap=5).collect()
    )
    per = Counter(s for s, _, _ in out1)
    assert all(per[s] == min(5, n) for s, n in sizes.items())
    assert all(rk <= 5 for _, _, rk in out1)
    # deterministic under repartitioning
    out2 = sorted(
        (r["source"], r["doc_id"], r["rk"])
        for r in cap_per_group(docs.repartition(7), cap=5).collect()
    )
    assert out1 == out2
    # rank order matches the python md5 reference
    ids = [
        (r["source"], r["doc_id"]) for r in docs.select("source", "doc_id").collect()
    ]
    by_src: dict = {}
    for s, i in ids:
        by_src.setdefault(s, []).append(i)
    for s, members in by_src.items():
        ranked = sorted(
            members, key=lambda i: (hashlib.md5(f"cap|{i}".encode()).hexdigest(), i)
        )[:5]
        got_members = [i for src, i, _ in out1 if src == s]
        assert got_members == sorted(got_members) or True  # order-free set check below
        assert set(got_members) == set(ranked)

    with pytest.raises(ValueError):
        cap_per_group(docs, cap=0)


def test_corpus_shuffle_dense_and_deterministic(docs):
    from datastream_deltalake_connector_spark.operators.sampling import corpus_shuffle

    n = docs.count()
    out1 = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in corpus_shuffle(docs, n_shards=8).collect()
    )
    assert len(out1) == n and len({i for i, _, _ in out1}) == n
    by_shard: dict = {}
    for _, s, p in out1:
        assert 0 <= s < 8
        by_shard.setdefault(s, []).append(p)
    # positions are dense 1..len within every shard
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # hash-uniform: every shard populated at 500 docs / 8 shards
    assert len(by_shard) == 8
    # stable under repartitioning
    out2 = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in corpus_shuffle(docs.repartition(5), n_shards=8).collect()
    )
    assert out1 == out2
    # a different salt is a different permutation
    out3 = sorted(
        (r["doc_id"], r["shard"], r["pos"])
        for r in corpus_shuffle(docs, n_shards=8, salt="epoch2").collect()
    )
    assert out1 != out3

    with pytest.raises(ValueError):
        corpus_shuffle(docs, n_shards=0)


def test_temperature_sample_exact_membership(docs):
    import math

    from datastream_deltalake_connector_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(r["doc_id"], r["lang"]) for r in docs.select("doc_id", "lang").collect()]
    counts = Counter(lang for _, lang in rows)
    cmin = min(counts.values())
    thr = {
        g: math.floor(math.sqrt(cmin / c) * (1 << 20)) for g, c in counts.items()
    }

    def bucket(i) -> int:
        return int(hashlib.md5(f"{i}temp".encode()).hexdigest()[:8], 16) % (1 << 20)

    want = {(i, g) for i, g in rows if bucket(i) < thr[g]}
    got = {
        (r["doc_id"], r["lang"])
        for r in temperature_sample(docs, group_col="lang", alpha=0.5).collect()
    }
    assert got == want
    # the smallest group is kept whole
    smallest = min(counts, key=counts.get)
    assert sum(1 for _, g in got if g == smallest) == counts[smallest]

    with pytest.raises(ValueError):
        temperature_sample(docs, alpha=1.5)


def test_corpus_stats_matches_python_reference(docs, spark):
    import re

    from datastream_deltalake_connector_spark.operators.quality_filter import (
        corpus_stats,
    )

    # duplicate a known slice so the dup columns are exercised
    d = docs.unionByName(docs.where(F.col("doc_id") % 7 == 0))
    rows = [
        (r["source"], r["lang"], r["text"])
        for r in d.select("source", "lang", "text").collect()
    ]
    fp_n = Counter(re.sub(r"\s+", " ", t.strip().lower()) for _, _, t in rows)
    want = {}
    for src in {s for s, _, _ in rows}:
        mine = [(l, t) for s, l, t in rows if s == src]
        toks = sum(len(t.split()) if t.strip() else 0 for _, t in mine)
        dups = sum(
            1 for _, t in mine if fp_n[re.sub(r"\s+", " ", t.strip().lower())] > 1
        )
        want[src] = (len(mine), toks, len({l for l, _ in mine}), dups)
    got = {
        r["source"]: (r["n_docs"], r["sum_tokens"], r["n_langs"], r["n_dup_docs"])
        for r in corpus_stats(d).collect()
    }
    assert got == want
    assert sum(v[3] for v in want.values()) > 0  # injection worked


def test_asof_join_inclusive_and_unmatched(spark):
    from datetime import datetime

    from datastream_deltalake_connector_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, "u1", t("2024-01-01 10:00:00")),   # before any right -> null
            (2, "u1", t("2024-01-01 12:00:00")),   # equal ts -> inclusive match
            (3, "u1", t("2024-01-01 15:00:00")),   # after both -> latest (13:00)
            (4, "u2", t("2024-01-01 12:00:00")),   # other key, no right rows
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", t("2024-01-01 12:00:00"), 100.0),
            ("u1", t("2024-01-01 13:00:00"), 200.0),
        ],
        ["k", "ts", "v"],
    )
    out = {
        r["event_id"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", payload_cols=["v"]
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (100.0, t("2024-01-01 12:00:00"))
    assert out[3] == (200.0, t("2024-01-01 13:00:00"))
    assert out[4] == (None, None)


def test_asof_join_null_keys_and_null_ts_never_match(spark):
    from datetime import datetime

    from datastream_deltalake_connector_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, None, t("2024-01-01 12:00:00")),   # null key: kept, no match
            (2, "u1", t("2024-01-01 12:00:00")),   # must NOT see null-ts right row
        ],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (None, t("2024-01-01 10:00:00"), 1.0),  # null key: never matches
            ("u1", None, 2.0),                       # null ts: never matches
        ],
        ["k", "ts", "v"],
    )
    out = {
        r["event_id"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", payload_cols=["v"]
        ).collect()
    }
    assert out == {1: (None, None), 2: (None, None)}


def test_asof_join_payload_cols_dedupes_right_ts(spark):
    from datetime import datetime

    from datastream_deltalake_connector_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame([(1, "u1", t("2024-01-01 13:00:00"))], ["event_id", "k", "ts"])
    right = spark.createDataFrame([("u1", t("2024-01-01 12:00:00"), 5.0)], ["k", "ts", "v"])
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload_cols=["ts", "v"]
    )
    assert out.columns.count("asof_ts") == 1
    row = out.collect()[0]
    assert row["asof_ts"] == t("2024-01-01 12:00:00") and row["asof_v"] == 5.0


def test_asof_join_tiebreak_deterministic(spark):
    """Planted equal-timestamp right rows: the `tiebreak` column decides the
    winner (largest tiebreak value — last in ascending window order), stable
    across different input partitionings; without it, orderable payloads
    fall back to payload-struct order (largest payload wins)."""
    from datetime import datetime

    from datastream_deltalake_connector_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [(1, "u1", t("2024-01-01 12:30:00"))], ["event_id", "k", "ts"]
    )
    # two right rows sharing (k, ts); rid is the unique event id
    right_rows = [
        ("u1", t("2024-01-01 12:00:00"), 100.0, 7),
        ("u1", t("2024-01-01 12:00:00"), 200.0, 3),
    ]
    for n_parts in (1, 4):  # result must not depend on partitioning
        right = spark.createDataFrame(
            right_rows, ["k", "ts", "v", "rid"]
        ).repartition(n_parts)
        row = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload_cols=["v"], tiebreak="rid",
        ).collect()[0]
        assert row["asof_v"] == 100.0, "max-tiebreak (rid=7) row must win"

    # orderable-payload fallback (no tiebreak): payload struct is
    # (__ts, v) — equal __ts, so the larger v sorts last and wins
    right = spark.createDataFrame(right_rows, ["k", "ts", "v", "rid"])
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload_cols=["v"]
    ).collect()[0]
    assert row["asof_v"] == 200.0


def test_range_join_boundaries_and_bucket_spans(spark):
    """Inclusive endpoints; intervals spanning multiple buckets still match
    exactly once per (point, interval) pair — no dedup needed."""
    from datetime import datetime

    from datastream_deltalake_connector_spark.operators.range_join import (
        point_in_interval_join,
    )

    t = lambda s: datetime.fromisoformat(s)
    pts = spark.createDataFrame(
        [
            (1, "u1", t("2024-01-01 10:00:00")),  # exactly at start -> match
            (2, "u1", t("2024-01-01 11:30:00")),  # inside, next bucket
            (3, "u1", t("2024-01-01 12:00:00")),  # exactly at end -> match
            (4, "u1", t("2024-01-01 12:00:01")),  # one past end -> no match
            (5, "u2", t("2024-01-01 10:30:00")),  # other key -> no match
        ],
        ["pid", "k", "pt"],
    )
    # one interval spanning 3 hourly buckets
    iv = spark.createDataFrame(
        [("u1", t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00"))],
        ["k", "lo", "hi"],
    )
    got = sorted(
        r["pid"]
        for r in point_in_interval_join(
            pts, iv, on=["k"], point_ts="pt", start_ts="lo", end_ts="hi",
            bucket_seconds=3600,
        ).collect()
    )
    assert got == [1, 2, 3]
    # exactly one row per matching pair even with overlapping intervals
    iv2 = spark.createDataFrame(
        [
            ("u1", t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00")),
            ("u1", t("2024-01-01 11:00:00"), t("2024-01-01 13:00:00")),
        ],
        ["k", "lo", "hi"],
    )
    rows = point_in_interval_join(
        pts, iv2, on=["k"], point_ts="pt", start_ts="lo", end_ts="hi",
        bucket_seconds=3600,
    ).collect()
    pairs = sorted((r["pid"], str(r["lo"])) for r in rows)
    assert pairs == [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:00:00"),
        (2, "2024-01-01 11:00:00"),
        (3, "2024-01-01 10:00:00"),
        (3, "2024-01-01 11:00:00"),
        (4, "2024-01-01 11:00:00"),
    ]

"""Physical-plan audit: capture `.explain(formatted)` for headline queries
and summarize the markers that matter at 100 TB — pushed filters, pruned
read schemas, join strategies, exchange (shuffle) counts, and whole-stage
codegen coverage. Output: PLANS.md.

Usage: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    (
        "icepack_sql_merge",
        "Post-MERGE HEAD scan (general MERGE INTO parsed from SQL text). "
        "The merge itself ran as ONE full-outer join job (clause routing, "
        "cascades, projections, and observe counts all on it) over only "
        "the probe-hit files; the returned scan is a plain parquet read "
        "of the resulting files — no exchanges beyond the final ordering, "
        "no joins, ReadSchema limited to the 5 output columns.",
    ),
    (
        "icepack_sql_pipeline",
        "SQL control-plane final SELECT (text-routed CREATE/INSERT/UPDATE/"
        "DELETE/OPTIMIZE behind it). The SELECT rewrites the table ref to "
        "a temp view over the pinned scan, so the plan is a plain parquet "
        "read of the compacted files with column pruning — no joins, no "
        "exchanges beyond the final ordering.",
    ),
    (
        "icepack_datasource_read",
        "Registered-format read (Python DataSource API). Expect: a "
        "BatchScan icepack node (one input partition per surviving file — "
        "pushFilters pruned the rest during planning, driver-side) under "
        "the residual Filter Spark re-applies; no exchanges beyond the "
        "final ordering, no joins.",
    ),
    (
        "icepack_hidden_partitioning",
        "Transform-partitioned scans (day + bucket hidden partitioning). "
        "Both probes must be plain parquet reads of the PRUNED file lists "
        "(transform pruning is driver-side, zero data reads) with the "
        "residual predicates pushed into the scan — a union of two pruned "
        "scans, no joins, PushedFilters present on both branches.",
    ),
    (
        "icepack_delete_where",
        "Post-DELETE HEAD scan. The delete itself pruned 1 file by manifest "
        "stats, dropped 1 METADATA-ONLY (bounds + zero null count prove "
        "every row matched — never read), and CoW-rewrote 1; the returned "
        "scan is a plain parquet read of the surviving files — no "
        "exchanges beyond the final ordering, no joins, ReadSchema limited "
        "to the 5 output columns.",
    ),
    (
        "icepack_update_where",
        "Post-UPDATE HEAD scan. The update rewrote exactly the 2 files the "
        "BETWEEN range touches (third pruned by manifest stats) with the "
        "updated-row count observed ON the write job (no extra count "
        "scan); the returned scan is a plain parquet read — no exchanges "
        "beyond the final ordering, no joins.",
    ),
    (
        "icepack_wap_publish",
        "Published-main scan after a branch merge + fast_forward. Publish "
        "is an ancestry walk + pointer swap (zero jobs); the scan must be "
        "a plain parquet read of the branch-merged snapshot — no exchanges "
        "beyond the final ordering, no joins.",
    ),
    (
        "icepack_changes",
        "Change-data-feed reconstruction for one CoW merge commit. Expect: "
        "the commit's ADDED files and the resolved preimages of its REMOVED "
        "files full-outer-joined on the merge key (one exchange pair — both "
        "sides are the commit's churn working set, never the table), "
        "explode of the per-row change array, no scan of untouched files.",
    ),
    (
        "image_exif",
        "EXIF extraction over binary JPEGs. Expect: map-only — one "
        "mapInPandas fixture stage feeding one ArrowEvalPython (the "
        "exif_udf struct extraction), zero exchanges beyond the final "
        "ordering, zero joins.",
    ),
    (
        "icepack_rollback",
        "Post-rollback HEAD scan. Rollback is a manifest-only commit (one "
        "manifest read + one write, no data movement), so the scan must be "
        "a plain parquet read of the restored snapshot's original files — "
        "no exchanges beyond the final ordering, no joins.",
    ),
    (
        "cdc_merge_upsert_mor",
        "Merge-on-read resolved scan. Expect: plain parquet scan of "
        "unaffected files unioned with candidate files anti-joined against "
        "the broadcast delete-key set (BroadcastHashJoin LeftAnti) — zero "
        "exchanges, payload bytes never shuffle.",
    ),
    (
        "cdc_merge_upsert_bloom",
        "Bloom-pruned CoW merge result scan. The merge itself routed "
        "candidate finding through per-file manifest Bloom filters (one "
        "mapInPandas probe job over the winner keys — no broadcast range "
        "join); the returned scan is a plain pruned parquet read of the "
        "post-merge table. Expect: parquet scan, no exchanges beyond the "
        "final ordering, ReadSchema limited to the 5 output columns.",
    ),
    (
        "cdc_merge_composite",
        "Composite-PK CoW merge result scan. The merge LWW-deduped, "
        "guarded, and rewrote on the FULL (user_id, event_type) tuple; "
        "the returned scan is a plain pruned parquet read of the "
        "post-merge table — no exchanges, ReadSchema limited to the 5 "
        "output columns.",
    ),
    (
        "hilbert_key",
        "Hilbert clustering key. Expect: a single projection with one "
        "Arrow-batched pandas UDF (ArrowEvalPython) over the two key "
        "columns — zero exchanges, zero joins; ReadSchema pruned to "
        "(l_orderkey, l_linenumber, l_partkey, l_suppkey).",
    ),
    (
        "pricing_summary",
        "Filter + two-stage agg. Expect: shipdate filter pushed to parquet, "
        "ReadSchema pruned to the 7 used columns, partial HashAggregate "
        "before the single exchange.",
    ),
    (
        "broadcast_join_agg",
        "Star join. Expect: BroadcastHashJoin (customer side), no shuffle "
        "of orders before the join, partial agg before exchange.",
    ),
    (
        "shipping_priority",
        "TPC-H Q3 shape. Expect: both date filters pushed, customer "
        "broadcast, one shuffle for lineitem×orders, TakeOrderedAndProject "
        "instead of a global sort.",
    ),
    (
        "region_nation_revenue",
        "4-dim star join. Expect: every dimension BroadcastHashJoin; the "
        "only exchange is the final group-by.",
    ),
    (
        "cdc_lww_dedup_maxby",
        "LWW dedup via max_by. Expect: partial (map-side) HashAggregate "
        "before the exchange — half the shuffle of a window+sort plan.",
    ),
    (
        "salted_group_count",
        "Two-phase salted agg. Expect: two exchanges (key+salt, then key) — "
        "the price of skew immunity; both aggs have partial stages.",
    ),
    (
        "zorder_key",
        "Pure projection. Expect: zero exchanges, single WholeStageCodegen "
        "span, ReadSchema limited to 4 columns.",
    ),
    (
        "topk_orders",
        "Global top-k. Expect: TakeOrderedAndProject (per-partition top-k + "
        "driver merge), NOT a global Sort exchange.",
    ),
    (
        "orders_anti_recent",
        "Anti join. Expect: BroadcastHashJoin LeftAnti over the filtered "
        "lineitem side (filter pushed down first).",
    ),
    (
        "events_sessionize",
        "Sessionization. Expect: one hash exchange on user_id feeding the "
        "lag window, agg reuses the same partitioning (no second exchange "
        "before partial agg).",
    ),
    (
        "corpus_filter_docs",
        "Quality verdicts. Expect: one exchange for the content-hash groupBy, "
        "keepers broadcast back for the rejoin (no second shuffle), no UDFs, "
        "ReadSchema limited to (doc_id, text).",
    ),
    (
        "token_count_bpe_docs",
        "Pure projection over a regex extract. Expect: zero exchanges, one "
        "WholeStageCodegen span, ReadSchema (doc_id, text).",
    ),
    (
        "winnow_fingerprints_docs",
        "Rolling-hash fingerprints. Expect: zero exchanges before the "
        "explode — grams, window minima, and distinct all per-row folds.",
    ),
    (
        "hash_split_docs",
        "Deterministic split assignment. Expect: zero exchanges, single "
        "WholeStageCodegen span (pure md5-bucket projection), ReadSchema "
        "(doc_id) only.",
    ),
    (
        "vocabulary_docs",
        "Corpus vocabulary. Expect: partial HashAggregate before the one "
        "token exchange (map-side combine collapses occurrences to distinct "
        "tokens), TakeOrderedAndProject for the top-k — no global sort.",
    ),
    (
        "contamination_docs",
        "Decontamination probe. Expect: benchmark shingles built then "
        "BroadcastHashJoin LeftSemi-shaped inner probe — the corpus side "
        "never shuffles before the join; one exchange for the per-doc hit "
        "count.",
    ),
    (
        "segment_dedup_docs",
        "Corpus-wide segment dedup. Expect: segments built as per-row array "
        "folds (no pre-explode shuffle), partial HashAggregate before the "
        "segment exchange (keeper election is map-side combined — skew-safe), "
        "one more exchange for per-doc reassembly: two exchanges total, no "
        "window sort, no join.",
    ),
    (
        "chunk_docs",
        "Context-window chunking. Expect: zero exchanges — sequence() + "
        "posexplode + substring all pipelined in one scan stage; ReadSchema "
        "(doc_id, text).",
    ),
    (
        "repetition_metrics_docs",
        "Gopher repetition signals. Expect: grams built as per-row array "
        "folds (no join), partial HashAggregate before BOTH exchanges "
        "(gram counts, then doc rollup) — shuffled rows carry (id, gram, "
        "count), never the text.",
    ),
    (
        "source_cap_docs",
        "Domain cap. Expect: ONE exchange (on source) feeding the rank "
        "window; ReadSchema (doc_id, source) — the text never reads.",
    ),
    (
        "corpus_shuffle_docs",
        "Training-order shuffle. Expect: ONE exchange (on the derived "
        "shard) feeding the position window; no global sort.",
    ),
    (
        "pii_redact_docs",
        "PII scrub. Expect: zero exchanges, one WholeStageCodegen span — a "
        "pure regexp_replace/regexp_count projection; ReadSchema "
        "(doc_id, text).",
    ),
    (
        "temperature_sample_docs",
        "Temperature rebalancing. Expect: the only exchanges are on the "
        "tiny rate-table side (group counts, global min, rate derivation — "
        "rows bounded by the number of groups); the corpus itself joins via "
        "BroadcastHashJoin and filters map-side — document rows never "
        "shuffle.",
    ),
    (
        "corpus_stats_docs",
        "Per-source report card. Expect: the dedup shuffle (groupBy "
        "fingerprint) reused as a count, the join back runs on the same "
        "key, one more exchange for the source rollup — shuffled rows are "
        "(fp, source, lang, n_tokens), never the text.",
    ),
    (
        "incremental_dedup_docs",
        "Incremental dedup. Expect: anti join on fingerprint with the "
        "corpus side reduced to a distinct fp column; keeper election is a "
        "partial-aggregated groupBy on the small survivor set.",
    ),
    (
        "url_dedup_docs",
        "URL-level dedup. Expect: canonicalization is a pure projection "
        "(regexp + array HOFs, no UDF) fused into the scan stage; ONE "
        "exchange for the canonical-key groupBy with a partial aggregate "
        "before it.",
    ),
    (
        "events_json_extract",
        "JSON payload extraction. Expect: get_json_object fused into the "
        "scan projection, partial HashAggregate before the single "
        "event_type exchange; ReadSchema (event_type, props).",
    ),
    (
        "events_asof_join",
        "As-of join. Expect: ONE exchange on user_id feeding the "
        "last-non-null window — the union is a plan-only node; no per-key "
        "cross product, no range-join blowup.",
    ),
    (
        "token_rarity_docs",
        "Corpus-frequency rarity. Expect: partial HashAggregate before the "
        "token-count exchange; the token->freq join keyed on the exploded "
        "token column; final doc rollup partial-aggregated.",
    ),
    (
        "tfidf_top_terms",
        "TF-IDF keywords. Expect: tf and df both partial-aggregated before "
        "their exchanges; ONE window on doc_id for the top-3 cut; "
        "ReadSchema (doc_id, text).",
    ),
    (
        "events_pivot",
        "Pivot with enumerated values. Expect: two exchanges, BOTH "
        "partial-aggregated — (user,type) pair counts, then the pivot "
        "rollup on user_id whose shuffle carries one row per DISTINCT "
        "pair, not per event; enumerating the values avoids a third "
        "value-discovery pass. ReadSchema (event_type, user_id).",
    ),
    (
        "events_range_join",
        "Bucketed range join. Expect: an EQUI-join on (user_id, bucket) "
        "with the exact predicate as a post-join filter — broadcast at "
        "test scale, shuffled hash/SMJ at scale; the point is what is "
        "ABSENT: no BroadcastNestedLoopJoin, no per-key cross product "
        "(the plan Spark picks for the raw theta join).",
    ),
    (
        "semantic_dedup_docs",
        "Composed semantic dedup. Expect: verdicts BROADCAST back onto the "
        "corpus (docs side never shuffles for the final join); ReadSchema "
        "(doc_id) on the documents scan.",
    ),
    (
        "rollup_revenue",
        "ROLLUP grouping sets. Expect: ONE Expand-fed aggregate pair (partial "
        "+ final around a single exchange) — not one scan per grouping level.",
    ),
    (
        "cube_revenue",
        "CUBE grouping sets with grouping_id. Expect: same single-Expand "
        "shape as rollup; exchange count stays 1 despite 4 grouping sets.",
    ),
    (
        "daily_distinct_users",
        "countDistinct + exact median per day. Expect: Expand for the "
        "distinct rewrite with partial aggregation; percentile is the only "
        "sort-bearing aggregate.",
    ),
    (
        "promo_revenue_share",
        "TPC-H Q14 conditional-aggregate shape. Expect: part dimension "
        "BroadcastHashJoin, shipdate range pushed to the lineitem scan, one "
        "exchange for the brand rollup.",
    ),
    (
        "customers_semi_urgent",
        "EXISTS semi-join. Expect: LeftSemi BroadcastHashJoin (orders side "
        "reduced before broadcast), customer scan pruned to 3 columns.",
    ),
    (
        "events_windowed_agg",
        "Tumbling event-time window (batch twin). Expect: window projection "
        "feeds a partial-agg pair around one exchange; events ReadSchema "
        "pruned to (ts, user_id, value).",
    ),
    (
        "value_percentiles",
        "Exact grouped percentiles. Expect: (event_type, value)-only shuffle "
        "(ReadSchema 2 columns), sort-based percentile in the final "
        "aggregate, count still map-side combined.",
    ),
    (
        "levenshtein_pairs_docs",
        "Blocked fuzzy dedup. Expect: candidates from an EQUI-join on the "
        "block prefix (no BroadcastNestedLoopJoin / cartesian anywhere), "
        "block-count cap joined WITHOUT a pinned broadcast hint (counts are "
        "O(distinct blocks); AQE broadcasts adaptively when actually small), "
        "levenshtein inside codegen.",
    ),
    (
        "image_png_ingest",
        "Real-PNG fixture decode. Expect: map-only plan — one range source "
        "into MapInPandas (encode+decode executor-side), ZERO exchanges; "
        "correctness is pinned by the closed-form SQL oracle.",
    ),
    (
        "image_jpeg_ingest",
        "Real-JPEG fixture decode (Huffman+IDCT in the engine). Expect: the "
        "same map-only MapInPandas shape, ZERO exchanges; dims + PSNR>=40dB "
        "vs the closed-form rule in the oracle.",
    ),
    (
        "audio_wav_ingest",
        "Real-WAV fixture decode (RIFF parse in the engine) through the "
        "production audio_features operator. Expect: map-only chained "
        "MapInPandas, ZERO exchanges; exact windowed RMS vs the rule.",
    ),
    (
        "video_gif_frames",
        "Real-GIF frame sampling (LZW decode in the engine) through the "
        "production sample_video_frames explode. Expect: map-only chained "
        "MapInPandas (1-to-N rows inside the UDF), ZERO exchanges; frames "
        "byte-exact vs the rule.",
    ),
    (
        "minhash_lsh_pairs_docs",
        "MinHash LSH through the capped _bucket_pairs core. Expect: "
        "zero-shuffle sketch (no exchange before the bucket groupBy), the "
        "hot-bucket COUNT pre-filter aggregates before any collect_list "
        "(degenerate buckets never materialize members), no cartesian or "
        "nested-loop join anywhere.",
    ),
    (
        "video_frame_sample",
        "Real MJPEG-in-AVI frame sampling (r5): RIFF container walk + "
        "per-sampled-frame JPEG decode inside the production "
        "sample_video_frames explode. Expect: map-only chained "
        "MapInPandas, ZERO exchanges — skipped frames are never "
        "entropy-decoded (every MJPEG frame is an independent keyframe), "
        "so cost is O(sampled), not O(stored).",
    ),
    (
        "phash_neardup_images",
        "Perceptual-hash near-dup pairs through the pigeonhole "
        "hamming_pairs banding (r5: brute-force-oracled corpus). Expect: "
        "JVM-only band expansion (no Python), ONE groupBy on "
        "(band, bucket) feeding the capped in-array pair expansion, exact "
        "bit_count verify as a filter — no self-join of the corpus, no "
        "cartesian product.",
    ),
]


def summarize(plan: str) -> dict:
    # Count only the detail-section headers "(N) OperatorName" — the tree
    # section repeats every operator and would double-count.
    def ops(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.M))

    return {
        "pushed_filters": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
        "broadcast_joins": ops("BroadcastHashJoin"),
        "smj": ops("SortMergeJoin"),
        "exchanges": ops("Exchange"),
        "wscg": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from datastream_deltalake_connector_spark.session import get_spark

    import __spark_entry__ as entrymod

    # AQE off for the audit only: un-executed adaptive plans print without
    # codegen ids and hide the final operator chain; static plans expose both.
    # (The engine runs with AQE ON everywhere else.)
    spark = get_spark(
        app_name="plan-audit",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan audit (auto-generated by scripts/audit_plans.py)",
        "",
        f"Plans captured at `{sf_dir}` with AQE DISABLED for the capture only",
        "(adaptive plans print without codegen ids and hide the final operator",
        "chain; the engine runs with AQE on everywhere else). Per query: what",
        "the plan MUST look like for the 100 TB posture, then the evidence",
        "(`.explain(formatted)` markers) that it does.",
        "",
    ]
    for name, expectation in AUDIT:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        s = summarize(plan)
        out += [
            f"## {name}",
            "",
            expectation,
            "",
            f"- exchanges (shuffles): **{s['exchanges']}**",
            f"- broadcast hash joins: **{s['broadcast_joins']}**, sort-merge joins: **{s['smj']}**",
            f"- scans with pushed filters: **{s['pushed_filters']}**",
            f"- whole-stage codegen spans: **{s['wscg']}**",
            f"- top-k via TakeOrderedAndProject: **{s['take_ordered']}**",
        ]
        cols = [
            f"`{rs[:100]}{'…' if len(rs) > 100 else ''}`" for rs in s["read_schemas"]
        ]
        if cols:
            out.append(f"- read schemas (pruned): {', '.join(cols)}")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark corpus.

Shape at 100 TB: the benchmark side is small (eval sets are MBs, not TBs),
so its distinct shingle set is **broadcast** — the training corpus is
scanned once, map-side hash-probed, and only the sparse hit rows reach the
one groupBy(doc_id) shuffle. No corpus self-join, no sort, no repeat scan.

Uses the same word-k-gram shingles as the Jaccard/MinHash family
(:func:`..text_dedup.shingle_tokens`), so a contamination policy composes
with the dedup policy on one tokenization definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_dedup import shingle_tokens

__all__ = ["contamination_check"]


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_hits): distinct k-gram shingles each training doc shares
    with ANY benchmark doc; only docs with ≥ ``min_hits`` are returned.
    Emitting hit counts (not a bare boolean) lets the caller pick a
    threshold per benchmark size downstream without a recompute."""
    bench_sh = (
        benchmark.select(
            F.explode(shingle_tokens(F.col(text_col), k)).alias("shingle")
        )
        .distinct()
    )
    # shingle_tokens is per-doc distinct, so count(*) after the join counts
    # distinct shared shingles without a countDistinct re-shuffle.
    doc_sh = docs.select(
        F.col(id_col), F.explode(shingle_tokens(F.col(text_col), k)).alias("shingle")
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )

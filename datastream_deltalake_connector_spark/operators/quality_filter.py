"""Corpus keep/drop filtering: the decision stage of a training-data pipeline.

Composes the text signals (functions/text.py: token count, punctuation and
stopword density — all integer-scaled with DuckDB SQL twins) and exact
dedup into one per-document verdict with a reason code. Rule order is fixed
(first failure wins) so the output is deterministic and SQL-twinnable:

    exact_dup → too_short → too_long → high_punct → low_stopword → keep

Everything is one projection plus one aggregate-join on the content hash:
two shuffles total (hash groupBy + the rejoin), no UDFs, no window over the
corpus — the same plan shape at 10^12 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score_cols, quality_score_sql, token_count_sql

__all__ = [
    "corpus_filter",
    "corpus_filter_sql",
    "repetition_metrics",
    "corpus_stats",
    "corpus_stats_sql",
]

DEFAULTS = dict(
    min_tokens=10,
    max_tokens=50_000,
    max_punct_per_10k=2_000,
    min_stopword_per_10k=200,
)


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = DEFAULTS["min_tokens"],
    max_tokens: int = DEFAULTS["max_tokens"],
    max_punct_per_10k: int = DEFAULTS["max_punct_per_10k"],
    min_stopword_per_10k: int = DEFAULTS["min_stopword_per_10k"],
) -> DataFrame:
    """(doc_id, n_tokens, keep, reason) for every document."""
    q = quality_score_cols(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("__hash"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_per_10k"].alias("__punct"),
        q["stopword_per_10k"].alias("__stop"),
    )
    keepers = scored.groupBy("__hash").agg(F.min(id_col).alias("__keeper"))
    reason = (
        F.when(F.col(id_col) != F.col("__keeper"), F.lit("exact_dup"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("__punct") > max_punct_per_10k, F.lit("high_punct"))
        .when(F.col("__stop") < min_stopword_per_10k, F.lit("low_stopword"))
        .otherwise(F.lit("keep"))
    )
    return (
        scored.join(keepers, "__hash")
        .select(
            id_col,
            "n_tokens",
            reason.alias("reason"),
        )
        .withColumn("keep", F.col("reason") == "keep")
    )


def corpus_filter_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = DEFAULTS["min_tokens"],
    max_tokens: int = DEFAULTS["max_tokens"],
    max_punct_per_10k: int = DEFAULTS["max_punct_per_10k"],
    min_stopword_per_10k: int = DEFAULTS["min_stopword_per_10k"],
) -> str:
    """DuckDB twin of ``corpus_filter`` — same rule order, same thresholds."""
    q = quality_score_sql(text_col)
    return f"""
WITH scored AS (
  SELECT {id_col},
         md5({text_col}) AS h,
         {q['n_tokens']} AS n_tokens,
         {q['punct_per_10k']} AS punct,
         {q['stopword_per_10k']} AS stop
  FROM {table}
),
keepers AS (SELECT h, min({id_col}) AS keeper FROM scored GROUP BY h),
verdict AS (
  SELECT {id_col}, n_tokens,
         CASE
           WHEN {id_col} != keeper THEN 'exact_dup'
           WHEN n_tokens < {min_tokens} THEN 'too_short'
           WHEN n_tokens > {max_tokens} THEN 'too_long'
           WHEN punct > {max_punct_per_10k} THEN 'high_punct'
           WHEN stop < {min_stopword_per_10k} THEN 'low_stopword'
           ELSE 'keep'
         END AS reason
  FROM scored JOIN keepers USING (h)
)
SELECT {id_col}, n_tokens, reason, reason = 'keep' AS keep FROM verdict
"""


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per document: the
    fraction of word n-gram occurrences claimed by the single most frequent
    n-gram (``top_gram_frac``) and by all n-grams that occur more than once
    (``dup_gram_frac``). MassiveText drops documents whose top 2-gram
    exceeds ~0.20 of the text; the thresholding is left to the caller
    (compose with ``corpus_filter``-style verdicts).

    Scale shape: overlapping n-grams are built per row with pure array ops
    (split → sequence → slice folds — no join, no pre-explode shuffle),
    then ONE exploded groupBy(doc, gram) with map-side partial aggregation
    and a second doc-level aggregation. Both shuffles carry (id, gram,
    count) — never the document text. Documents shorter than ``n`` words
    have no n-grams and are absent from the output."""
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(n), F.size(words)),
        lambda i: F.array_join(F.slice(words, i - n + 1, n), " "),
    )
    occ = df.where(F.size(words) >= n).select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    per_gram = occ.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    agg = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("total_grams"),
        F.max("cnt").alias("top_gram_count"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_gram_count"
        ),
    )
    return agg.select(
        id_col,
        "total_grams",
        "top_gram_count",
        "dup_gram_count",
        (F.col("top_gram_count") / F.col("total_grams")).alias("top_gram_frac"),
        (F.col("dup_gram_count") / F.col("total_grams")).alias("dup_gram_frac"),
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus report card: document count, token volume,
    language diversity, and exact-duplicate rate — the at-a-glance health
    table a curation run starts and ends with.

    Scale shape: duplicate detection is the exact-dedup shuffle (groupBy
    normalized fingerprint) re-used as a count; its per-doc verdict joins
    back on the fingerprint (same key, co-partitioned by AQE), then ONE
    aggregation on the source key. Token/lang columns ride along as
    codegen'd projections — the text itself never shuffles (only
    (fingerprint, source, lang, n_tokens) rows do)."""
    from ..functions.text import fingerprint_norm, token_count

    per_doc = df.select(
        F.col(group_col),
        F.col(lang_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        fingerprint_norm(F.col(text_col)).alias("fp"),
    )
    fp_counts = per_doc.groupBy("fp").agg(F.count(F.lit(1)).alias("fp_n"))
    return (
        per_doc.join(fp_counts, "fp")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.countDistinct(lang_col).alias("n_langs"),
            F.sum(F.when(F.col("fp_n") > 1, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_dup_docs"
            ),
        )
        .select(
            group_col,
            "n_docs",
            "sum_tokens",
            "n_langs",
            "n_dup_docs",
            F.round(F.col("n_dup_docs") * 10000 / F.col("n_docs"))
            .cast("long")
            .alias("dup_per_10k"),
        )
    )


def corpus_stats_sql(
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    lang_col: str = "lang",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`corpus_stats`."""
    from ..functions.text import fingerprint_norm_sql, token_count_sql

    fp = fingerprint_norm_sql(text_col)
    toks = token_count_sql(text_col)
    return f"""
WITH per_doc AS (
  SELECT {group_col}, {lang_col},
         CAST({toks} AS BIGINT) AS n_tokens, {fp} AS fp
  FROM {table}
),
fp_counts AS (SELECT fp, count(*) AS fp_n FROM per_doc GROUP BY fp)
SELECT {group_col},
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(DISTINCT {lang_col}) AS BIGINT) AS n_langs,
       CAST(sum(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(round(sum(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END) * 10000.0
                  / count(*)) AS BIGINT) AS dup_per_10k
FROM per_doc JOIN fp_counts USING (fp)
GROUP BY {group_col}
"""

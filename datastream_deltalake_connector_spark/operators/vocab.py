"""Corpus-wide vocabulary: token frequencies and top-k selection.

The canonical "build the tokenizer's world" pass of a training-data
pipeline. Shape at 100 TB: explode is map-side; the groupBy(token) count
gets a partial (map-side combine) aggregate, so the shuffle carries one
row per *distinct* token per partition, not one per token occurrence —
Zipf's law makes that reduction enormous. Top-k is
``TakeOrderedAndProject`` (per-partition heaps, no global sort).

Ties at the cut are broken (freq DESC, token ASC) so the selected set is
deterministic and the DuckDB oracle selects the identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_frequencies", "vocabulary", "vocabulary_sql"]


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, freq) over whitespace tokens of lower(trim(text)); empty
    tokens (blank docs) are dropped."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Top-``top_n`` tokens by frequency (freq DESC, token ASC)."""
    return (
        token_frequencies(df, text_col)
        .where(F.col("freq") >= min_count)
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_n)
    )


def vocabulary_sql(
    text_col: str = "text",
    table: str = "documents",
    top_n: int = 1000,
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`vocabulary` — identical tokenization and
    tie-break, so the selected set hash-matches."""
    return f"""
SELECT token, CAST(count(*) AS BIGINT) AS freq
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS token
  FROM {table}
)
WHERE token <> ''
GROUP BY token
HAVING count(*) >= {min_count}
ORDER BY freq DESC, token ASC
LIMIT {top_n}
"""

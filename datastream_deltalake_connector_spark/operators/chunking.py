"""Document chunking: fixed character windows with overlap.

Training pipelines cut long documents into model-context-sized pieces with
an overlap so no span is ever split across a boundary without context. The
reference engine has no analogue (its unit of work is a CDC row); this is a
pure derived-row operator in the spirit of the engine's other corpus ops.

Scale shape: chunk starts are generated per row with ``sequence()`` (a
codegen expression — no driver loop, no join against a numbers table) and
exploded; the only data movement is the explode itself, which is pipelined
inside the scan stage — zero shuffles. Each output row carries its
``substring`` slice, so the full text is never duplicated per chunk at rest
beyond what the chunks themselves cover (window + overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """One row per (document, chunk): ``chunk_id``, ``start`` (0-based char
    offset), ``chunk`` text and its length. Consecutive chunks overlap by
    ``overlap`` characters; the last chunk may be shorter. Empty documents
    yield a single empty chunk (start 0), so every input row is represented.
    """
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    step = window - overlap
    # last start must contribute at least one NEW character past the overlap
    # it shares with its predecessor: start <= len - overlap - 1. Without
    # this, a doc of exactly `window` chars would grow a tail chunk that is
    # entirely contained in the first.
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    return (
        df.select(F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.substring(F.col(text_col), F.col("start") + 1, window).alias("chunk"),
        )
        .withColumn("chunk_chars", F.length("chunk").cast("long"))
    )

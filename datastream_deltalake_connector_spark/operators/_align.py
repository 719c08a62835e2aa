"""Case-insensitive schema alignment shared by every load path.

Spark resolves identifiers case-insensitively; a Python ``c in df.columns``
check is case-sensitive and would silently null-fill a correctly-named
column whose case differs (``INSERT INTO t (ID)`` vs column ``id`` — data
loss, not an error). Every surface that projects arbitrary input onto a
table schema (SQL INSERT/CTAS, COPY INTO, the MERGE ``*`` projections)
resolves through this one helper instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["align_to_schema"]


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project ``df`` onto the schema's columns by case-insensitive name:
    matches cast to the declared types, genuinely-missing columns
    null-fill, extra source columns drop."""
    by_lower: dict[str, str] = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), c)
    return df.select(
        *[
            (
                F.col(f"`{by_lower[f.name.lower()]}`")
                if f.name.lower() in by_lower
                else F.lit(None)
            )
            .cast(f.dataType)
            .alias(f.name)
            for f in schema.fields
        ]
    )

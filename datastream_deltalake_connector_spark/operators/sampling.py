"""Deterministic corpus sampling and train/val/test split assignment.

Reproducible splits at 100 TB must be pure functions of the row key — no
RNG state, no order dependence, no shuffle, no driver coordination. A
``sample()``/``rand()`` split changes membership with partitioning and
retry history; a hash split never does. Everything here is one codegen'd
projection per row: md5-bucket the (salted) key, compare against
cumulative integer thresholds. The same row lands in the same split on
any cluster size, any partitioning, any engine — the SQL twins run the
identical expression in DuckDB, and the driver hash-checks both sides.

md5 (not xxhash64) is deliberate: it is the hash both engines implement
bit-identically, so the assignment is portable/auditable outside Spark.
Eight hex chars (32 bits) keep the bucket statistic unbiased far beyond
any practical bucket count while fitting a BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "cap_per_group",
    "cap_per_group_sql",
    "corpus_shuffle",
    "corpus_shuffle_sql",
    "temperature_sample",
    "temperature_sample_sql",
    "hash_bucket_sql",
    "hash_split",
    "hash_split_sql_case",
    "hash_sample",
]


def hash_bucket(key: Column, buckets: int = 10_000, salt: str = "") -> Column:
    """Uniform bucket in [0, buckets) as a pure function of (key, salt)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def hash_bucket_sql(key: str, buckets: int = 10_000, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket` — same md5 prefix, same modulus."""
    return (
        f"(('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def _cumulative(weights: dict[str, int]) -> list[tuple[str, int]]:
    """(split_name, exclusive_upper_bucket) in declaration order."""
    edges, acc = [], 0
    for name, parts in weights.items():
        if parts <= 0:
            raise ValueError(f"split '{name}' must get a positive bucket count")
        acc += parts
        edges.append((name, acc))
    return edges


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds ``bucket`` and ``split`` columns assigning each row to a named
    split with exact integer proportions (``weights`` are parts of a whole;
    the bucket space is their sum — e.g. ``{"train": 98, "val": 1,
    "test": 1}`` is a 98/1/1 split over 100 buckets)."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    edges = _cumulative(weights)
    total = edges[-1][1]
    b = hash_bucket(F.col(id_col), buckets=total, salt=salt)
    assign: Column = F.lit(edges[-1][0])
    for name, hi in reversed(edges[:-1]):
        assign = F.when(b < hi, F.lit(name)).otherwise(assign)
    return df.withColumn("bucket", b).withColumn("split", assign)


def hash_split_sql_case(
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> tuple[str, str]:
    """DuckDB twin: (bucket_sql, split_case_sql) for the same assignment."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    edges = _cumulative(weights)
    total = edges[-1][1]
    bucket = hash_bucket_sql(id_col, buckets=total, salt=salt)
    whens = " ".join(
        f"WHEN {bucket} < {hi} THEN '{name}'" for name, hi in edges[:-1]
    )
    return bucket, f"CASE {whens} ELSE '{edges[-1][0]}' END"


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction_x10k: int = 100,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ``fraction_x10k``/10000 sample — membership is stable
    under re-runs, repartitioning, and incremental appends (a row's verdict
    never changes when new rows arrive, unlike ``DataFrame.sample``)."""
    if not 0 <= fraction_x10k <= 10_000:
        raise ValueError(f"fraction_x10k must be in [0, 10000]: {fraction_x10k}")
    return df.where(hash_bucket(F.col(id_col), 10_000, salt) < fraction_x10k)


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    salt: str = "cap",
) -> DataFrame:
    """Bound per-group representation (the "domain cap" of web-corpus
    curation: no single source may contribute more than ``cap`` documents).
    Selection is deterministic: rows rank by ``md5(salt|id)`` within their
    group, so the kept set is a stable uniform sample that does not change
    under repartitioning or re-runs, and adding NEW rows to a group evicts
    existing members only as ranks genuinely shift — no RNG state anywhere.

    Scale shape: one shuffle on ``group_col`` feeding a rank window. A
    pathologically hot group sorts all its members; if one group ever holds
    a material fraction of the corpus, prefilter with
    ``hash_bucket(id) < ~4*cap*buckets/count(group)`` from a broadcast of
    group counts before the exact window — the window semantics are
    unchanged, the sort volume drops to O(cap) per group."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1: {cap}")
    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(group_col, id_col)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= cap)
    )


def cap_per_group_sql(
    group_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 10,
    salt: str = "cap",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`cap_per_group` (same md5 rank order)."""
    h = f"md5('{salt}' || '|' || CAST({id_col} AS VARCHAR))"
    return f"""
WITH r AS (
  SELECT {group_col}, {id_col},
         row_number() OVER (
           PARTITION BY {group_col} ORDER BY {h}, {id_col}
         ) AS rk
  FROM {table}
)
SELECT {group_col}, {id_col}, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= {cap}
"""


def corpus_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic training-order shuffle: every row gets a ``shard``
    and a dense within-shard position ``pos``, both pure functions of
    (salt, id). Reading shards in order yields a reproducible uniform
    permutation of the corpus — the "shuffle the data before training"
    step, without RNG state or a global sort.

    Scale shape: ONE shuffle, on ``shard`` (the window partition key).
    Shards are hash-uniform, so sizing ``n_shards`` to the cluster (e.g.
    2-4× executor count at 100 TB) bounds per-partition sort volume; no
    global ordering structure is ever materialized. Changing ``salt``
    yields an independent permutation (new epoch order)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    h = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), h.alias("h"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def corpus_shuffle_sql(
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shuffle",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`corpus_shuffle` (same md5 order and shard)."""
    h = f"md5('{salt}' || '|' || CAST({id_col} AS VARCHAR))"
    shard = f"(('0x' || substr({h}, 1, 8))::BIGINT % {n_shards})"
    return f"""
WITH s AS (
  SELECT {id_col}, {h} AS h, {shard} AS shard FROM {table}
)
SELECT {id_col}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, {id_col}) AS BIGINT)
         AS pos
FROM s
"""


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rebalancing: downsample over-represented
    groups so expected kept counts are ∝ count^alpha (alpha=1 keeps the
    natural mixture, alpha=0 equalizes groups). The smallest group is kept
    whole; a group of size c keeps rows at rate (c_min/c)^(1-alpha) — the
    standard "temperature" resampling of multilingual/multi-source corpora.

    Membership is a pure function of (salt, id): rate thresholds are scaled
    by 2^20 (a power of two, so the multiply is lossless) and compared
    against the md5 bucket of the id. For alpha=0.5 the rate is computed
    with sqrt — correctly rounded in IEEE 754, so Spark and the DuckDB twin
    agree bit-for-bit; other alphas go through pow(), where a last-ulp
    divergence at a bucket boundary is theoretically possible (the SQL twin
    therefore only supports alpha=0.5).

    Scale shape: ONE small aggregation (group counts) broadcast back; the
    corpus itself is filtered map-side — no shuffle of the data rows."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt"))
    cmin = counts.agg(F.min("cnt").alias("cmin"))
    ratio = F.col("cmin").cast("double") / F.col("cnt").cast("double")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    thr = F.floor(rate * F.lit(float(1 << 20))).cast("long")
    rates = counts.crossJoin(F.broadcast(cmin)).select(group_col, thr.alias("thr"))
    return (
        df.join(F.broadcast(rates), group_col)
        .where(hash_bucket(F.col(id_col), 1 << 20, salt) < F.col("thr"))
        .select(id_col, group_col)
    )


def temperature_sample_sql(
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "temp",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`temperature_sample` at alpha=0.5 (sqrt is the
    one fractional power both engines round identically)."""
    bucket = hash_bucket_sql(f"d.{id_col}", 1 << 20, salt)
    return f"""
WITH c AS (SELECT {group_col}, count(*) AS cnt FROM {table} GROUP BY {group_col}),
m AS (SELECT min(cnt) AS cmin FROM c),
r AS (
  SELECT {group_col},
         CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(cnt AS DOUBLE))
                    * {float(1 << 20)!r}) AS BIGINT) AS thr
  FROM c, m
)
SELECT d.{id_col}, d.{group_col}
FROM {table} d JOIN r ON d.{group_col} = r.{group_col}
WHERE {bucket} < r.thr
"""

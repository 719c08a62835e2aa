"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector. The dot
  product is a JVM-side ``aggregate(zip_with(...))`` fold — no UDF, no
  Python, scales linearly and embarrassingly parallel (narrow map + single
  top-k reduce; Spark's ``orderBy().limit(k)`` does per-partition top-k then
  merges on the driver — no full sort shuffle).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH. Each vector is
  bucketed by the sign pattern of ``n_planes`` fixed hyperplane dots
  (deterministic, seeded numpy, shipped as literal arrays); the query probes
  its own bucket plus all Hamming-1 neighbors (multiprobe), and only
  candidates are exactly re-ranked. Recall is tested against brute force.

At 10^12-row scale the bucket column would be a partition/cluster key of the
table itself (write-time bucketing), so a query touches only its probe
buckets' files via manifest pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "dot_literal",
    "cosine_topk",
    "hyperplanes",
    "lsh_bucket",
    "lsh_ann_topk",
    "embedding_neardup_lsh",
    "ivf_centroids",
    "ivf_fit_centroids",
    "ivf_assign",
    "ivf_ann_topk",
]


def dot_literal(vec_col: Column, query: list[float]) -> Column:
    """⟨vec, literal query⟩ as a codegen fold in double precision."""
    q = F.array(*[F.lit(float(x)) for x in query])
    prods = F.zip_with(vec_col.cast("array<double>"), q, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col: Column) -> Column:
    sq = F.aggregate(
        vec_col.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity; output (rank, id, cos_x10k) with
    integer-scaled similarity and id as the deterministic tie-break."""
    qn = float(np.sqrt(np.dot(query, query)))
    cos = dot_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qn))

    scored = df.select(
        F.col(id_col),
        F.round(cos * 10000).cast("long").alias("cos_x10k"),
        cos.alias("__cos"),
    )
    # Distributed top-k first (per-partition TakeOrdered + driver merge — no
    # global sort shuffle). Ranking the ≤k survivors needs no window at all
    # (a global window here would fold its constant partition key away and
    # re-trigger the "No Partition Defined" WindowExec warning): force one
    # sorted partition and number rows positionally.
    top = (
        scored.orderBy(F.desc("__cos"), F.col(id_col))
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(F.desc("__cos"), F.col(id_col))
    )
    return top.select(
        (F.monotonically_increasing_id() + 1).cast("int").alias("rank"),
        id_col,
        "cos_x10k",
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-pattern bucket id from the fixed hyperplanes (JVM-side folds)."""
    acc = F.lit(0)
    for i, plane in enumerate(planes):
        acc = acc.bitwiseOR(
            F.when(dot_literal(vec_col, plane.tolist()) > 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        )
    return acc


def lsh_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket plus all buckets
    within the multiprobe Hamming radius, re-rank candidates exactly. Same
    output shape as cosine_topk. Defaults (8 planes, radius 2) probe 37 of
    256 buckets ≈ 15% of the corpus — tune n_planes up as corpus grows so
    the probed fraction stays small."""
    planes = hyperplanes(len(query), n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    qbits = 0
    for i, plane in enumerate(planes):
        if float(plane @ q) > 0:
            qbits |= 1 << i
    probes = {qbits}
    if multiprobe_hamming >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if multiprobe_hamming >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    cands = bucketed.where(F.col("__bucket").isin(*probes))
    return cosine_topk(cands, query, k, vec_col, id_col)


def _cos_cols(a: Column, b: Column) -> Column:
    """cosine(a, b) between two array columns as JVM folds (no UDF)."""
    dot = F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm(a) * _norm(b))


def embedding_neardup_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    min_cos_x10k: int = 9000,
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    max_bucket: int = 2000,
) -> DataFrame:
    """Embedding-cosine near-dup PAIRS at corpus scale — the bucketed twin
    of the exact all-pairs probe (which is O(n²) by construction and must
    never leave test cardinality). Classic multi-table random-hyperplane
    LSH: ``n_tables`` independent sign-pattern bucketings; two vectors are
    candidates if they share a bucket in ANY table (collision prob per table
    = (1 - θ/π)^n_planes, so tables stack recall for near-0 angles); only
    candidates get the exact cosine verify. Pair generation is the same
    single-groupBy in-array expansion as MinHash-LSH (no self-join), with
    the same hot-bucket cap. Output: (id_a, id_b, cos_x10k)."""
    dim_row = df.select(F.size(vec_col).alias("d")).head()
    if dim_row is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cos_x10k long"
        )
    dim = dim_row["d"]
    # ALL tables' sign-pattern buckets in one vectorized pandas_udf: a
    # single (batch × dim) @ (dim × tables·planes) matmul per Arrow batch,
    # then sign bits folded to per-table bucket ids. The Column-expression
    # alternative (n_tables · n_planes interpreted aggregate() dot folds
    # per row) was the whole cost of this query at bench scale.
    planes_stack = np.concatenate(
        [hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (n_tables * n_planes, dim)
    bit_weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<int>")
    def all_buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes_stack.T) > 0  # (n, tables*planes)
        per_tbl = signs.reshape(len(mat), n_tables, n_planes) @ bit_weights
        return pd.Series(list(per_tbl.astype(np.int32)))

    buckets = df.select(
        F.col(id_col), F.posexplode(all_buckets(F.col(vec_col))).alias("tbl", "bucket")
    )
    # shared capped pair expansion (text_dedup._bucket_pairs): the cap is a
    # COUNT pre-filter, so a degenerate bucket never materializes its member
    # list before being dropped
    from .text_dedup import _bucket_pairs

    cand = (
        _bucket_pairs(buckets, ["tbl", "bucket"], F.col(id_col), max_bucket)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    cos = _cos_cols(F.col("__va"), F.col("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", F.round(cos * 10000).cast("long").alias("cos_x10k")
        )
        .where(F.col("cos_x10k") >= min_cos_x10k)
    )


# --------------------------------------------------------------------- IVF
def ivf_centroids(dim: int, n_cells: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic unit-norm cell centroids (seeded random projections) —
    the un-fitted fallback when no data is available to train on. Prefer
    ``ivf_fit_centroids``."""
    c = np.random.default_rng(seed).standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_fit_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means codebook fit on a corpus sample (driver-side numpy,
    kmeans++-style farthest-point seeding). This is the standard IVF recipe:
    the codebook is fit ONCE on a bounded sample and broadcast as literals —
    the sample collect is the only driver data transfer, capped at
    ``sample_size`` rows regardless of corpus size."""
    n_total = df.count()
    frac = min(1.0, (sample_size * 1.2) / max(n_total, 1))
    rows = (
        df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size).collect()
    )
    x = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    if len(x) < n_cells:
        return ivf_centroids(x.shape[1] if len(x) else 2, n_cells, seed)
    # kmeans++ seeding by cosine distance
    cents = [x[rng.integers(len(x))]]
    for _ in range(n_cells - 1):
        sims = np.max(np.stack([x @ c for c in cents]), axis=0)
        d2 = np.maximum(1.0 - sims, 0.0) ** 2
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=p)])
    c = np.stack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
            else:  # dead cell: reseed at the point farthest from its centroid
                far = np.argmin(np.max(x @ c.T, axis=1))
                c[j] = x[far]
    return c


def ivf_assign(vec_col: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid cell id by cosine (vectors need not be normalized:
    argmax of dot/|v| equals argmax of dot for a fixed v). JVM-side:
    array of centroid dots → array_position of the max — no Python."""
    dots = F.array(*[dot_literal(vec_col, c.tolist()) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    centroids: np.ndarray | None = None,
    fit: bool = True,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse centroid,
    probe the ``nprobe`` cells nearest the query, re-rank candidates exactly.
    Same output shape as cosine_topk. At 10^12 rows the cell id is the
    table's write-time partition key, so probing touches only nprobe/n_cells
    of the files via manifest pruning.

    ``centroids``: a pre-fit codebook (the production path — fit once,
    reuse); otherwise fit one on a corpus sample (``fit=True``, default) or
    fall back to seeded random projections (``fit=False``)."""
    if centroids is not None:
        cents = centroids
    elif fit:
        cents = ivf_fit_centroids(df, vec_col, n_cells, seed=seed)
    else:
        cents = ivf_centroids(len(query), n_cells, seed)
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(-(cents @ q))
    probe_cells = [int(c) for c in order[:nprobe]]
    assigned = df.withColumn("__cell", ivf_assign(F.col(vec_col), cents))
    cands = assigned.where(F.col("__cell").isin(*probe_cells))
    return cosine_topk(cands, query, k, vec_col, id_col)

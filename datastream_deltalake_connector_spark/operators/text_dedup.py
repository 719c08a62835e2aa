"""Deduplication operators for document corpora at training-data scale.

All hot paths are JVM-side DataFrame expressions (split/transform/explode/
groupBy — whole-stage codegen, map-side partial aggregation); nothing here
uses a Python UDF. The family:

- exact: hash-groupBy on content digest. One shuffle on the digest.
- fingerprint: same, on normalized content (functions/text.fingerprint_norm).
- n-gram Jaccard: exact pairwise similarity via shingle explode + self-join
  on shingle. Quadratic in the worst case — the *oracle* / small-corpus
  path.
- MinHash + LSH: the scale path. Each shingle is hashed ONCE JVM-side
  (``transform(shingles, s -> xxhash64(s))``), then the k-permutation
  signature is a vectorized-numpy pandas_udf: ``min((a_i*h + b_i) mod
  2^64)`` per row with odd multipliers ``a_i`` (each an exact permutation
  of Z_2^64, so min-hash semantics hold). Still ZERO shuffles to sketch —
  and 64x fewer hash evaluations than the previous per-seed
  ``array_min(transform(.., xxhash64(s, i)))`` fold, whose interpreted
  HOF passes dominated the query bench. Bands explode to (band, bucket);
  ONE groupBy collects each bucket's ids, applies the hot-bucket cap, and
  emits candidate pairs in-array — no count window, no self-join.
- SimHash: 64-bit sign-aggregate of token hashes; near-dup = small Hamming
  distance, found via band buckets + ``bit_count`` verify. Like MinHash,
  the sketch is zero-shuffle: tokens are hashed once JVM-side, then a
  vectorized-numpy pandas_udf does the 64 per-bit sign sums with
  ``np.add.reduceat`` — no token explode, no 64-column groupBy shuffle
  (the round-1 formulation shuffled every token of the corpus).

At 100 TB the shuffles are: one groupBy (band, bucket) over (doc_id, band,
bucket) triples — tiny rows, hot buckets capped — one distinct over the
candidate pairs, and the sparse verify joins against cached shingle arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "exact_dedup",
    "dedup_against_corpus",
    "dedup_against_corpus_sql",
    "dedup_segments",
    "shingle_tokens",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "hamming_pairs",
    "connected_components",
    "dedup_keep_list",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: keeper = min id, dup_count."""
    return (
        df.select(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_words: int = 3,
) -> DataFrame:
    """Corpus-wide repetition removal at segment granularity (the C4 rule
    "drop any line that occurs more than once in the corpus", re-expressed
    over fixed ``window_words``-word segments because web text has lines and
    this corpus does not).

    Each document is cut into consecutive k-word segments (pure array ops —
    split → slice folds, no explode until segments exist), every segment's
    globally-first occurrence (lexicographic min of (doc_id, seg_id)) is
    kept, and each surviving document is reassembled in segment order.

    Scale shape: the keeper election is ONE map-side-combined aggregation —
    ``groupBy(segment).agg(min(struct(doc_id, seg_id)))`` — whose output IS
    the kept set (one row per distinct segment), so there is no window sort
    over duplicate groups and no join back to the corpus; a segment
    duplicated a million times costs one combiner cell per map task, which
    is what makes this safe on a 100 TB corpus with heavy boilerplate skew.
    Reassembly is a second aggregation by document. Two shuffles total,
    both with partial aggregation."""
    words = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(words) / F.lit(window_words)).cast("int")
    segments = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(
            F.slice(words, i * window_words + 1, window_words), " "
        ),
    )
    seg = df.select(
        F.col(id_col), F.posexplode(segments).alias("seg_id", "segment")
    )
    keep = (
        seg.groupBy("segment")
        .agg(F.min(F.struct(F.col(id_col), F.col("seg_id"))).alias("k"))
        .select(
            F.col(f"k.{id_col}").alias(id_col),
            F.col("k.seg_id").alias("seg_id"),
            "segment",
        )
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seg_id", "segment"))),
        lambda s: s["segment"],
    )
    return keep.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(ordered, " ").alias("text_clean"),
    )


def shingle_tokens(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of ``text`` as an array column (JVM-side:
    split → transform(sequence) → array_distinct). Short docs (<k tokens)
    yield an empty array.

    The token array is bound as a ``transform`` lambda variable: referencing
    the ``split()`` column directly from the inner lambda would inline a copy
    of the split into every per-shingle evaluation — an O(n²)-per-doc re-split
    that made this tokenization 92% of the round-1 LSH bench."""

    def make(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
        return F.when(n >= k, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    bound = F.transform(F.array(F.split(F.trim(F.lower(text)), r"\s+")), make)
    return F.element_at(bound, 1)


def _exploded_shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(shingle_tokens(F.col(text_col), k)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_jaccard_x10k: int = 500,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.

    Output: (id_a, id_b, jaccard_x10k) with id_a < id_b, integer-scaled.
    Pairs are generated by self-equi-join on shingle — never a cross join;
    cost is Σ_shingle df(shingle)², fine for corpora/oracles, superseded by
    MinHash-LSH at scale."""
    sh = _exploded_shingles(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter") * 10000.0 / (F.col("na") + F.col("nb") - F.col("inter")))
            .cast("long")
            .alias("jaccard_x10k"),
        )
        .where(F.col("jaccard_x10k") >= min_jaccard_x10k)
    )


def _shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, __sh) with the distinct-shingle array; docs shorter than k tokens
    (empty array) are dropped — matching the explode formulation, where they
    produced no rows."""
    return df.select(
        F.col(id_col), shingle_tokens(F.col(text_col), k).alias("__sh")
    ).where(F.size("__sh") > 0)


_MINHASH_SEED = 0x5EED_F00D


def _perm_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_i, b_i) for x -> a_i*x + b_i (mod 2^64). Odd a_i
    makes each map a bijection of Z_2^64, so min over a mapped shingle-hash
    set is a valid MinHash permutation."""
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(0, 2**64, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**64, size=num_hashes, dtype=np.uint64)
    return a, b


def _make_signature_udf(num_hashes: int):
    """array<long> shingle-hashes -> array<long> k-min signature.

    Vectorized over the whole Arrow batch: flatten every row's hash array,
    then per permutation one fused multiply-add over the flat vector and a
    segmented min (``np.minimum.reduceat``). No per-row Python, no per-seed
    rehash of the shingle strings — the base xxhash64 runs once JVM-side."""
    a_params, b_params = _perm_params(num_hashes)

    @pandas_udf("array<long>")
    def sig(hvals: pd.Series) -> pd.Series:
        arrs = hvals.to_numpy()
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n)
        nonempty = lens > 0
        sigs = np.zeros((n, num_hashes), dtype=np.uint64)
        if nonempty.any():
            flat = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in arrs[nonempty]]
            ).view(np.uint64)
            # segment starts within the nonempty-only flat vector
            ne_lens = lens[nonempty]
            ne_starts = np.zeros(len(ne_lens), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=ne_starts[1:])
            for i in range(num_hashes):
                t = flat * a_params[i] + b_params[i]  # uint64 wraparound
                sigs[nonempty, i] = np.minimum.reduceat(t, ne_starts)
        out = sigs.view(np.int64)
        return pd.Series(list(out))

    return sig


def _signature_col(num_hashes: int) -> Column:
    """The full signature as ONE array column: hash each shingle once in the
    JVM, then the numpy permutation fold."""
    base = F.transform(F.col("__sh"), lambda s: F.xxhash64(s))
    return _make_signature_udf(num_hashes)(base)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash sketch computed entirely map-side — no explode, no shuffle."""
    shs = _shingle_arrays(df, text_col, id_col, k)
    sigged = shs.select(F.col(id_col), _signature_col(num_hashes).alias("__sig"))
    return sigged.select(
        F.col(id_col),
        *[F.element_at("__sig", i + 1).alias(f"h{i}") for i in range(num_hashes)],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_min_jaccard_x10k: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    b bands of r = num_hashes/b rows; a pair collides if any band's row-hash
    tuple matches. ``max_bucket`` caps degenerate buckets (hot-shingle skew
    guard): buckets larger than the cap are dropped — at scale those are
    boilerplate clusters handled by exact dedup first. If
    ``verify_min_jaccard_x10k`` is set, candidates are re-scored with exact
    Jaccard (on the candidate set only, reusing the cached shingle arrays)
    and filtered."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # Cache the shingle arrays: they feed the signature derivation AND both
    # sides of the verify join — one tokenization pass total.
    shs = _shingle_arrays(df, text_col, id_col, k).cache()
    # Signature via the numpy permutation fold (one JVM xxhash64 pass over
    # the shingles, then a vectorized pandas_udf — see module docstring),
    # then band buckets as a small JVM transform over the signature array.
    # Bucket ids hash each band's r-element slice; bucketing only needs
    # EQUALITY of the r-tuples, which slice-hashing preserves.
    band_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice(F.col("__sig"), b * r + 1, r)).alias("bucket"),
        ),
    )
    buckets = (
        shs.select(F.col(id_col), _signature_col(num_hashes).alias("__sig"))
        .select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(id_col, "bb.band", "bb.bucket")
    )
    # Capped in-array pair generation (shared _bucket_pairs): the hot-bucket
    # cap is applied via a count pre-filter BEFORE any member list is
    # collected, so boilerplate buckets never materialize; the per-group
    # pair fan-out is bounded by C(max_bucket, 2).
    cand = (
        _bucket_pairs(buckets, ["band", "bucket"], F.col(id_col), max_bucket)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))  # duplicate ids sort adjacent
        .distinct()
    )
    if verify_min_jaccard_x10k is None:
        return cand
    # Exact re-score of the CANDIDATE pairs only: join each side to its
    # cached distinct-shingle array and take array_intersect — never the
    # full pairwise shingle self-join (that quadratic pass is exactly what
    # LSH exists to avoid; at corpus scale it would dwarf the sketch).
    a = shs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    b = shs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size(F.col("__sha")) + F.size(F.col("__shb")) - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter * 10000.0 / union).cast("long").alias("jaccard_x10k"),
        )
        .where(F.col("jaccard_x10k") >= verify_min_jaccard_x10k)
    )


def _bucket_pairs(
    rows: DataFrame,
    group_cols: list[str],
    member: Column,
    max_bucket: int,
) -> DataFrame:
    """Shared capped C(n,2) pair expansion within buckets: emit columns
    ``a``/``b`` (the sorted ``member`` values) for every unordered pair that
    shares a bucket, skipping buckets larger than ``max_bucket``.

    The cap is enforced BEFORE any member list materializes: a
    pre-aggregated COUNT (map-side-combined longs only) selects surviving
    buckets and the rows are semi-joined to them, so a degenerate
    boilerplate bucket of millions of members never builds a multi-GB
    ``collect_list`` aggregation buffer on one executor just to be thrown
    away by a post-hoc size filter. The join shares the groupBy's
    partitioning key, so the collect needs no additional exchange.
    Both the MinHash-LSH and Hamming-band paths route through here — the
    skew posture is identical by construction."""
    counts = rows.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    ok = counts.where(
        (F.col("__n") >= 2) & (F.col("__n") <= max_bucket)
    ).select(*group_cols)
    bounded = rows.join(ok, group_cols)
    members = F.array_sort(F.collect_list(member))
    pair_structs = F.flatten(
        F.transform(
            F.col("__m"),
            lambda x, i: F.transform(
                F.slice(F.col("__m"), i + 2, F.size(F.col("__m"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        bounded.groupBy(*group_cols)
        .agg(members.alias("__m"))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
    )


def _make_simhash_udf():
    """array<long> token-hashes -> 64-bit SimHash, vectorized per Arrow batch.

    Flatten every row's hash array, then per bit j one mask pass over the
    flat vector and a segmented sum (``np.add.reduceat``). Bit j of the
    output is set iff more than half the tokens (with multiplicity) have
    bit j set — identical to the sign-of-sum(±1) rule of the aggregate
    formulation, with zero shuffle and no 64-column groupBy. (Factory, not
    a module-level decorator: pandas_udf parses its DDL return type eagerly
    and so needs an active SparkSession.)"""

    @pandas_udf("long")
    def sh(hvals: pd.Series) -> pd.Series:
        arrs = hvals.to_numpy()
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype="int64")
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            flat = np.concatenate(
                [np.asarray(x, dtype=np.int64) for x in arrs[nonempty]]
            ).view(np.uint64)
            ne_lens = lens[nonempty]
            ne_starts = np.zeros(len(ne_lens), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=ne_starts[1:])
            acc = np.zeros(len(ne_lens), dtype=np.uint64)
            one = np.uint64(1)
            for j in range(64):
                ones = np.add.reduceat((flat >> np.uint64(j)) & one, ne_starts)
                # sum of (2*bit - 1) > 0  <=>  2*ones > len
                acc |= ((2 * ones > ne_lens).astype(np.uint64)) << np.uint64(j)
            out[nonempty] = acc
        return pd.Series(out.view(np.int64))

    return sh


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: sign-aggregate of token xxhash64 bits.

    Zero-shuffle: tokens are hashed once JVM-side (``transform(split(..),
    t -> xxhash64(t))``, multiplicity preserved), then the numpy pandas_udf
    folds the 64 sign sums map-side. The result is cached — downstream
    pair-finding consumes it from multiple band joins."""
    if bits != 64:
        raise ValueError(f"simhash is fixed at 64 bits (xxhash64): got {bits}")
    tok_hashes = F.transform(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: F.xxhash64(t),
    )
    return df.select(
        F.col(id_col), _make_simhash_udf()(tok_hashes).alias("simhash")
    ).cache()


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Banding: ``max_hamming + 1`` bands (pigeonhole: flipping ≤ max_hamming
    bits cannot touch every band, so any qualifying pair shares at least one
    exact band) — candidates come from equi-joins on band values, then
    ``bit_count(xor)`` verifies exactly. More bands ⇒ narrower bands ⇒ more
    candidate collisions: recall stays guaranteed, cost grows — at corpus
    scale keep max_hamming small or pre-dedup exact clusters first.

    ``max_hamming`` must be < 16: with a 64-bit hash, ≥17 bands would be
    ≤3 bits wide and collide near-universally, and capping bands at 16 (as a
    silent fallback would) voids the pigeonhole guarantee — 16+ flips can
    touch all 16 bands."""
    sh = simhash(df, text_col, id_col)
    return hamming_pairs(
        sh,
        hash_col="simhash",
        id_col=id_col,
        max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def hamming_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Generic 64-bit Hamming near-dup pair finder over ANY hash column —
    the banding core shared by SimHash (text) and perceptual-hash image
    dedup (``phash`` per input_hint). Same pigeonhole guarantee and the
    same <16 distance bound as simhash_pairs.

    Same skew posture as :func:`minhash_lsh_pairs`: ONE groupBy on
    (band, bucket) collects each band bucket's members and expands the
    C(n, 2) pairs in-array, and ``max_bucket`` drops degenerate buckets —
    a boilerplate-heavy corpus puts millions of docs on one band value, and
    an uncapped band self-join would emit a 10^12-row candidate set from a
    single hot bucket. Oversized buckets are boilerplate clusters that exact
    dedup handles first; per-group fan-out is bounded by C(max_bucket, 2)."""
    if not 0 <= max_hamming < 16:
        raise ValueError(
            f"max_hamming must be in [0, 16): got {max_hamming}; the 64-bit "
            "pigeonhole banding cannot guarantee recall beyond 15"
        )
    n_bands = max_hamming + 1
    width = 64 // n_bands
    h = F.col(hash_col)

    def band_val(b: int) -> Column:
        # band b covers bits [b*width, ...); the last band takes the remainder
        w = 64 - b * width if b == n_bands - 1 else width
        shifted = F.shiftrightunsigned(h, b * width)
        if w >= 64:  # single-band degenerate case: the whole hash
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w) - 1))

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_val(b).alias("bucket"))
            for b in range(n_bands)
        ]
    )
    banded = df.select(
        F.col(id_col), F.col(hash_col), F.explode(band_structs).alias("bb")
    ).select(id_col, hash_col, "bb.band", "bb.bucket")
    # shared capped pair expansion; members sorted by (id, hash) so the
    # in-array expansion emits id_a <= id_b, strict < drops self-pairs
    member = F.struct(F.col(id_col).alias("i"), F.col(hash_col).alias("h"))
    return (
        _bucket_pairs(banded, ["band", "bucket"], member, max_bucket)
        .select(
            F.col("a.i").alias("id_a"),
            F.col("b.i").alias("id_b"),
            F.col("a.h").alias("sa"),
            F.col("b.h").alias("sb"),
        )
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact CC for a SMALL edge list: collect (src, dst) pairs, union-find
    with path compression and union-by-min (attaching the larger root under
    the smaller keeps every tree's root = its component's min id, matching
    the distributed min-label semantics bit for bit). One Arrow collect +
    one Arrow createDataFrame instead of ~2 joins + 2 actions per round."""
    pdf = edges.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    node_type = edges.schema[0].dataType
    out = pd.DataFrame(
        {"node": list(parent.keys()), "rep": [find(x) for x in list(parent.keys())]}
    )
    schema = T.StructType(
        [T.StructField("node", node_type), T.StructField("rep", node_type)]
    )
    return spark.createDataFrame(out, schema=schema)


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_chars: int = 16,
    compare_chars: int = 80,
    max_dist: int = 8,
    max_block: int = 1000,
    suffix_block: bool = True,
) -> DataFrame:
    """Blocked fuzzy near-dup pairs by Levenshtein distance — the classic
    record-linkage shape (block, compare within block) for typo-level
    duplicates that shingle/minhash treats as identical and exact dedup
    misses entirely.

    Scale story: Levenshtein is O(len²) per comparison, so it NEVER runs
    all-pairs — candidates come from an equi-join on a cheap blocking key
    (the normalized ``block_chars``-char prefix), the comparison reads only
    ``compare_chars``-char heads, and ``max_block`` caps degenerate blocks
    (boilerplate prefixes) exactly like the LSH paths cap hot buckets. All
    JVM codegen (``F.levenshtein``): no UDF, no Python.

    Recall: an edit inside the first ``block_chars`` characters moves the
    row to another prefix block, so ``suffix_block=True`` (default) ALSO
    blocks on the trailing ``block_chars`` characters and unions the two
    candidate sets (a pair escapes only if edited in BOTH its head and its
    tail — beyond typo-level distance anyway). Each blocking pass is an
    independent capped equi-join; the union dedups on (id_a, id_b)."""

    def pass_pairs(block_expr) -> DataFrame:
        norm = F.lower(F.trim(F.col(text_col)))
        base = df.select(
            F.col(id_col).alias("__id"),
            block_expr(norm).alias("__blk"),
            F.substring(norm, 1, compare_chars).alias("__head"),
        )
        counts = base.groupBy("__blk").agg(F.count(F.lit(1)).alias("__n"))
        # NOT F.broadcast: the counts frame has one row per DISTINCT block
        # key — O(corpus) rows when prefixes are high-cardinality — so a
        # forced broadcast risks driver/executor OOM at scale. A plain join
        # lets AQE broadcast adaptively when the side is actually small,
        # exactly like the sibling _bucket_pairs cap path (round-3 advice).
        bounded = base.join(
            counts.where(F.col("__n") <= max_block).select("__blk"),
            "__blk",
        )
        a, b = bounded.alias("a"), bounded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.__blk") == F.col("b.__blk"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select(
                F.col("a.__id").alias("id_a"),
                F.col("b.__id").alias("id_b"),
                F.levenshtein(
                    F.col("a.__head"), F.col("b.__head")
                ).alias("edit_dist"),
            )
            .where(F.col("edit_dist") <= max_dist)
        )

    out = pass_pairs(lambda n: F.substring(n, 1, block_chars))
    if suffix_block:
        out = out.unionByName(
            pass_pairs(lambda n: F.substring(n, -block_chars, block_chars))
        ).dropDuplicates(["id_a", "id_b"])
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 1,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """Connected components over near-dup pair edges: (node, rep) where
    ``rep`` is the minimum node id of the component — the canonical "keeper"
    election that turns pairwise dup evidence into per-document decisions.

    Min-label propagation WITH pointer jumping: each round every node takes
    the smallest label among itself and its neighbors (one hop), then jumps
    to its label's label (path compression) — the doubling step makes
    convergence O(log diameter) instead of O(diameter), which matters when
    low-threshold pairs chain into long paths (observed: a 0.02-jaccard pair
    graph needed >25 one-hop rounds, 5 doubled rounds). All work is hash
    joins on (node, label) pairs — never the corpus. ``localCheckpoint``
    truncates the growing lineage each round so round N does not re-execute
    rounds 1..N-1. Two round-trip economies vs the naive loop: labels are
    SEEDED with ``least(node, min(neighbor))`` in one aggregation (a whole
    first round of joins for free), and convergence is detected by the
    label SUM — every node's label is non-increasing, so the total strictly
    decreases iff anything changed — a map-side aggregate per round instead
    of a full (old ⋈ new) comparison join. Only nodes that appear in some
    edge are returned (singletons have no dup decision to make).

    ``checkpoint_every``: localCheckpoint the label frame every k-th round
    (default 1 = every round). Each checkpoint materializes the FULL label
    set to executor local storage — at 10^10 nodes that is real disk
    pressure per round — while skipping it makes the next round recompute
    the unmaterialized tail of the lineage. k=2..3 halves the storage
    churn for graphs whose rounds are cheap; the convergence-sum action
    still runs every round, so correctness is cadence-independent.

    ``driver_max_edges``: edge lists at or below this size short-circuit to
    an exact driver-side union-find (same min-rep semantics) — the iterative
    loop costs ~4 Spark jobs per round in pure scheduling overhead, which
    dominates wall time when the dup graph is thousands of edges (the common
    case: dup pairs are a sliver of any corpus). One count-probe decides;
    0 disables the fast path. At 10^9+ edges the distributed loop is the
    only option and kicks in automatically."""
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # localCheckpoint BEFORE the size probe: the upstream pair pipeline
    # (shingling, LSH, cosine verify...) is expensive — it must run exactly
    # once whether the probe routes to the driver or the distributed path.
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint()
    if driver_max_edges and edges.count() <= driver_max_edges:
        return _driver_union_find(pairs.sparkSession, edges)
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint()
    # seed = one-hop minimum: least(node, min over neighbors) — identical to
    # round 1 of the propagate step, at the cost of a single groupBy
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("rep"))
        .withColumnRenamed("src", "node")
        .localCheckpoint()
    )

    def label_sum(df: DataFrame) -> int:
        # decimal(38,0): exact far beyond any 64-bit id-count product
        return df.agg(
            F.sum(F.col("rep").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev = label_sum(labels)
    for round_no in range(1, max_iter + 1):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("rep").alias("nbr_rep"))
        )
        stepped = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nbr_rep"), F.col("rep"))
                ).alias("rep"),
            )
        )
        # pointer jumping: rep := rep's rep (labels of reps come from the
        # same stepped frame — every rep is itself a node)
        jump_src = stepped.select(
            F.col("node").alias("__rn"), F.col("rep").alias("__rrep")
        )
        jumped = stepped.join(
            jump_src, stepped.rep == jump_src.__rn, "left"
        ).select(
            "node",
            F.coalesce(F.col("__rrep"), F.col("rep")).alias("rep"),
        )
        if round_no % checkpoint_every == 0:
            jumped = jumped.localCheckpoint()
        cur = label_sum(jumped)
        labels = jumped
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds 2^rounds (raise max_iter)"
    )


def dedup_keep_list(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Per-document dedup decision from pair evidence: (doc_id, cluster_rep,
    cluster_size, keep). ``keep`` is true only for the component's minimum
    id — the deterministic keeper; every other member is a drop."""
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(F.broadcast(sizes), "rep")
        .select(
            F.col("node").alias("doc_id"),
            F.col("rep").alias("cluster_rep"),
            "cluster_size",
            (F.col("node") == F.col("rep")).alias("keep"),
        )
    )


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: admit only new documents whose normalized
    fingerprint neither exists in the corpus nor collides with an
    earlier-id document inside the batch. This is the shape dedup takes in
    a continuously-ingesting 100 TB pipeline — the full-corpus self-join
    happens once at bootstrap; afterwards every arriving batch runs this.

    Scale shape: the corpus contributes ONLY its fingerprint column
    (ReadSchema prunes the text; precomputed/stored fingerprints make it a
    metadata-only scan), distinct-ed then left-anti joined. The batch side
    is small by definition, so AQE broadcasts it; with a fp-bucketed corpus
    layout the anti join is co-located and shuffle-free. The intra-batch
    keeper election is a groupBy on the (small) surviving batch."""
    from ..functions.text import fingerprint_norm

    new_fp = new_df.select(
        F.col(id_col), fingerprint_norm(F.col(text_col)).alias("fp")
    )
    corpus_fp = corpus_df.select(
        fingerprint_norm(F.col(text_col)).alias("fp")
    ).distinct()
    survivors = new_fp.join(corpus_fp, "fp", "left_anti")
    return (
        survivors.groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("batch_dup_count"))
        .select(id_col, "fp", "batch_dup_count")
    )


def dedup_against_corpus_sql(
    new_table: str,
    corpus_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`dedup_against_corpus`."""
    from ..functions.text import fingerprint_norm_sql

    fp = fingerprint_norm_sql(text_col)
    return f"""
WITH nf AS (SELECT {id_col}, {fp} AS fp FROM {new_table}),
cf AS (SELECT DISTINCT {fp} AS fp FROM {corpus_table}),
s AS (SELECT nf.* FROM nf ANTI JOIN cf USING (fp))
SELECT min({id_col}) AS {id_col}, fp,
       CAST(count(*) AS BIGINT) AS batch_dup_count
FROM s GROUP BY fp
"""

"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — exact, O(|Q| x |N|); correct shape for
a small query set against a large corpus when the corpus side stays
distributed and the query side is broadcast. Scale path: sign-LSH (random
hyperplane simplified to axis sign patterns) bucketing so candidates meet
only inside buckets.

All arithmetic is element-wise double math via built-in higher-order
functions (``zip_with``/``aggregate``) — JVM-side, no Python UDFs.
Similarities are rounded (6dp) so results are deterministic across
summation strategies and oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from monster_etl_spark.operators.partitioning import spread as _spread

SIGN_LSH_DIMS = 8  # first b dims' sign bits form the bucket key


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order, deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / F.nullif(norm(da) * norm(db), F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: corpus stays partitioned; the (small) query set is
    broadcast, so the cross product is a broadcast-nested-loop with no
    shuffle of the corpus. Ranking is a window partitioned by query —
    the only shuffle is on query_id (|Q| keys). Ties break on neighbor id
    for determinism. Self-matches are excluded.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = _spread(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def sign_bucket(vec: Column, dims: int = SIGN_LSH_DIMS) -> Column:
    """LSH bucket key: sign bits of the first ``dims`` components, as a
    string like ``"10110010"``. Equivalent to random-hyperplane LSH with
    axis-aligned planes — deterministic and SQL-expressible."""
    bits = [
        F.when(F.element_at(vec, i + 1).cast("double") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(dims)
    ]
    return F.concat(*bits)


def multiprobe_buckets(vec: Column, dims: int = SIGN_LSH_DIMS) -> Column:
    """Multi-probe LSH probe set: the exact sign pattern plus every
    1-bit-flipped pattern (``dims + 1`` probes). Probing neighbors in
    sign-space recovers most of the recall lost to bucketing WITHOUT
    growing corpus-side buckets — only the (small) query side fans out,
    so the join stays linear in bucket sizes."""
    bits = [
        F.when(F.element_at(vec, i + 1).cast("double") >= 0, F.lit(1)).otherwise(F.lit(0))
        for i in range(dims)
    ]

    def pattern(flip: int) -> Column:
        return F.concat(
            *[(F.lit(1) - b if i == flip else b).cast("string") for i, b in enumerate(bits)]
        )

    return F.array(pattern(-1), *[pattern(i) for i in range(dims)])


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int = SIGN_LSH_DIMS,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* the query's sign-LSH
    bucket. The join is an equi-join on the bucket key — shuffle-partitioned
    by bucket, linear in bucket sizes, never all-pairs. Recall is traded via
    ``dims`` (fewer bits -> bigger buckets -> higher recall) and recovered
    via ``multiprobe`` (query also probes all 1-bit-neighbor buckets; a
    (query, neighbor) pair still meets at most once since the corpus side
    keeps a single bucket)."""
    if multiprobe:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(multiprobe_buckets(F.col(vec_col), dims)).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            sign_bucket(F.col(vec_col), dims).alias("bucket"),
        )
    c = _spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nv"),
            sign_bucket(F.col(vec_col), dims).alias("bucket"),
        )
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dims: int = SIGN_LSH_DIMS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold), found
    within sign-LSH buckets (a >=0.95 pair almost always agrees on leading
    sign bits; exactness within the bucket). Returns (id_a, id_b, cosine_sim)."""
    v = _spread(
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            sign_bucket(F.col(vec_col), dims).alias("bucket"),
        )
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


IVF_CENTROIDS = 16
IVF_PROBES = 4
IVF_KMEANS_ITERS = 3


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_KMEANS_ITERS,
) -> DataFrame:
    """Deterministic spherical-k-means centroids, all-DataFrame Lloyd
    iterations: seed with the ``n_centroids`` lowest-id vectors, then
    ``iters`` rounds of (assign each vector to its most-cosine-similar
    centroid, recompute each centroid as the element-wise mean of its
    members).

    Scale shape per round: the centroid table is tiny and broadcast; the
    assignment is a broadcast-NL over k rows reduced by a map-side-
    combinable ``max_by`` (no window, one shuffle on the group key); the
    mean is posexplode -> groupBy(cent, pos) -> avg, linear in corpus
    size x dims. Centroids are ``localCheckpoint``-ed each round so the
    lineage stays one-round deep. Components are rounded (9dp) so the
    result is reproducible across partition orders. Cells that lose all
    members drop out (k shrinks, never grows). Returns (cent_id, cv).
    """
    v = _spread(corpus.select(F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("v")))
    if iters > 0:
        # every Lloyd round rescans the vectors; cache them for the loop
        # (MEMORY_AND_DISK default — spills instead of OOM at scale, the
        # same contract MLlib's k-means uses for its input)
        v = v.persist()
    # seed ranks via a single-row collect_list aggregate rather than a
    # row_number window: same deterministic ids, but no unpartitioned
    # WindowExec (its "all data to a single partition" warning is noise —
    # only n_centroids rows reach this — yet reads like a plan defect)
    cent = (
        v.orderBy("cid")
        .limit(n_centroids)
        .agg(F.array_sort(F.collect_list(F.struct("cid", "v"))).alias("seeds"))
        .select(F.posexplode("seeds").alias("idx", "s"))
        .select(
            (F.col("idx") + 1).cast("long").alias("cent_id"),
            F.col("s.v").alias("cv"),
        )
    )
    for _ in range(iters):
        best = (
            v.crossJoin(F.broadcast(cent))
            .select(
                "cid",
                "v",
                "cent_id",
                cosine(F.col("v"), F.col("cv")).alias("c_sim"),
            )
            # argmax by (similarity, then lowest cent_id) — deterministic;
            # v is functionally dependent on cid so first() is stable
            .groupBy("cid")
            .agg(
                F.max_by("cent_id", F.struct(F.col("c_sim"), -F.col("cent_id"))).alias("cent_id"),
                F.first("v").alias("v"),
            )
        )
        means = (
            best.select("cent_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(F.avg("val").alias("m"))
        )
        cent = (
            means.groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cent_id",
                F.transform("pm", lambda s: F.round(s.getField("m"), 9)).alias("cv"),
            )
            .localCheckpoint(eager=True)
        )
    if iters > 0:
        # the final centroids are checkpoint-materialized; the cached
        # vectors are no longer referenced
        v.unpersist(blocking=False)
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = IVF_CENTROIDS,
    n_probes: int = IVF_PROBES,
    kmeans_iters: int = IVF_KMEANS_ITERS,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is inverted into
    ``n_centroids`` cells (nearest-centroid assignment); a query probes its
    ``n_probes`` closest cells and ranks exactly within them.

    Centroids come from ``kmeans_centroids`` (deterministic Lloyd
    refinement; ``kmeans_iters=0`` degrades to the raw lowest-id seed).
    Scale shape: the centroid table broadcasts (tiny); corpus assignment
    is one narrow pass; the probe join is an equi-join on cell id, so
    per-query work is linear in the probed cells, never the full corpus.
    Deterministic given the corpus; recall is tested against the exact
    brute-force ranking (rows-only in the driver contract — the
    construction is too stateful for a readable SQL oracle).
    """
    cent = F.broadcast(
        kmeans_centroids(corpus, id_col, vec_col, n_centroids, kmeans_iters)
    )

    def assign(df: DataFrame, idc: str, vecc: str, keep_vec: str, top: int) -> DataFrame:
        scored = df.join(cent, how="cross").select(
            F.col(idc),
            F.col(vecc).alias(keep_vec),
            "cent_id",
            cosine(F.col(vecc), F.col("cv")).alias("c_sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("c_sim"), F.asc("cent_id"))
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= top)
            .select(idc, keep_vec, "cent_id")
        )

    c_assigned = assign(
        _spread(corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))),
        "neighbor_id", "nv", "nv", 1,
    )
    q_assigned = assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id", "qv", "qv", n_probes,
    )
    scored = (
        q_assigned.join(c_assigned, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )

"""Similarity search over embedding columns (``array<float>``).

North-star extension (no analog in the reference).  Two tiers:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side must be small (it is broadcast); corpus side streams.
  Cost O(|Q|·|C|·d) but perfectly parallel, no shuffle of the corpus.
- ``lsh_bucket`` + ``lsh_topk``: random-hyperplane LSH — the scale path.
  Corpus is bucketed once by sign-bit signature; queries probe only
  matching buckets, turning the scan into an equi-join.

Hyperplanes are derived deterministically from md5 (no RNG state to
ship), so results are reproducible run-to-run and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.functions import cosine_similarity, md5_hash64


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector (cosine).

    ``queries`` is broadcast (small side by contract); ranking uses a
    window partitioned by query id, so the shuffle is O(|Q|·|C|) scored
    pairs *after* per-partition pre-filtering by Spark's TakeOrdered-like
    window — acceptable because |Q| is small.
    """
    from yet_another_map_reduce_spark.functions import dot, norm

    query_id_col = query_id_col or id_col
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), qv.alias("__qv"), norm(qv).alias("__qn")
    )
    cv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), cv.alias("__cv"), norm(cv).alias("__cn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            # try_divide: zero-norm vectors rank last (NULL) instead of
            # raising ANSI divide-by-zero
            F.round(
                F.try_divide(dot(F.col("__cv"), F.col("__qv")), F.col("__cn") * F.col("__qn")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Component j of plane i = (md5(f"{i}:{j}") first-8-hex as int,
    centered to ±) — good enough for sign-LSH, fully reproducible in any
    engine with md5.
    """
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()
        v = int(h[:8], 16) / float(0xFFFFFFFF) - 0.5
        comps.append(v)
    return comps


def lsh_bucket(df: DataFrame, vec_col: str, num_planes: int = 8, dim: int = 64) -> DataFrame:
    """Add a ``bucket`` column: sign-bit signature over ``num_planes``
    fixed random hyperplanes (2^num_planes possible buckets).

    Pure expressions: each sign bit is a dot product against a literal
    array — broadcast as part of the plan, vectorized by codegen.
    """
    out = df
    bit_cols = []
    for i in range(num_planes):
        plane = _hyperplane(dim, i)
        dot_i = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bit_cols.append(F.when(dot_i >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    return out.withColumn("bucket", sum(bit_cols[1:], bit_cols[0]))


def ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str, nlist: int) -> DataFrame:
    """Deterministic seed centroids: the ``nlist`` lowest-id corpus
    vectors.

    At production scale this is the pluggable training step (k-means over
    a sample); seeding by id keeps results reproducible and engine-
    independent for the correctness gate.  The centroid set is tiny
    (``nlist`` rows) and always broadcast.
    """
    cv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        corpus.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(F.col(id_col).alias("centroid_id"), cv.alias("__centv"))
    )


def _nearest_centroids(
    df: DataFrame, id_out: str, vec_col: str, cent: DataFrame, nprobe: int
) -> DataFrame:
    """Per row: the ``nprobe`` nearest centroids by cosine (broadcast
    scan of the tiny centroid set; no corpus shuffle)."""
    from yet_another_map_reduce_spark.functions import dot, norm

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scored = (
        df.select(F.col(id_out).alias("__rid"), v.alias("__v"))
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "__cos",
            F.try_divide(
                dot(F.col("__v"), F.col("__centv")),
                norm(F.col("__v")) * norm(F.col("__centv")),
            ),
        )
    )
    w = Window.partitionBy("__rid").orderBy(
        F.col("__cos").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__crank", F.row_number().over(w))
        .where(F.col("__crank") <= nprobe)
        .select("__rid", "__v", "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: inverted-file partitioning by nearest
    centroid, probing only ``nprobe`` of ``nlist`` cells per query.

    Scale path: each corpus vector is assigned to exactly one cell
    (nprobe=1 on the build side), so at 100 TB the assigned corpus is
    written out partitioned by ``centroid_id`` and a probe touches
    ~``nprobe/nlist`` of the data at the file-pruning level.  With
    ``nprobe == nlist`` the search is exhaustive and equals
    ``cosine_topk`` exactly (pinned by test).
    """
    from yet_another_map_reduce_spark.functions import dot, norm

    query_id_col = query_id_col or id_col
    cent = ivf_centroids(corpus, id_col, vec_col, nlist)
    assigned = _nearest_centroids(corpus, id_col, vec_col, cent, 1).select(
        F.col("__rid").alias("neighbor_id"),
        F.col("__v").alias("__cv"),
        "centroid_id",
    )
    probes = _nearest_centroids(queries, query_id_col, vec_col, cent, nprobe).select(
        F.col("__rid").alias("query_id"), F.col("__v").alias("__qv"), "centroid_id"
    )
    scored = (
        assigned.join(F.broadcast(probes), on="centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                F.try_divide(
                    dot(F.col("__cv"), F.col("__qv")),
                    norm(F.col("__cv")) * norm(F.col("__qv")),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall is tunable via ``num_planes`` (fewer planes → bigger buckets
    → higher recall, more compute).  At 100 TB the bucketed corpus would
    be written out partitioned by bucket so probes prune at the file
    level.
    """
    query_id_col = query_id_col or id_col
    cb = lsh_bucket(corpus, vec_col, num_planes, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "bucket"
    )
    qb = lsh_bucket(queries, vec_col, num_planes, dim).select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine_similarity(F.col("__cv"), F.col("__qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )

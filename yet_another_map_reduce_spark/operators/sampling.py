"""Deterministic sampling operators for dataset splits and per-group
subsampling.

The reference has no sampling at all (its jobs always consume every
chunk, ``/root/reference/Client/client.py``); training-data pipelines
need splits that are (a) reproducible across runs and cluster layouts
and (b) expressible in the SQL oracle.  Everything here keys off
``functions.md5_hash64`` — a pure function of the row id — so results
are independent of partitioning, task order, and executor count, unlike
``df.sample``/``sampleBy`` whose seeded RNG is partition-layout
dependent.

Scale notes: ``hash_split`` is a pure narrow filter (pushes down, no
shuffle); ``reservoir_per_group`` is size-gated — a group-key window
below the threshold, and above it a per-input-partition local top-k
(no corpus exchange at all: only a partitions×groups summary and the
surviving P×G×k candidates move), since a window keyed on a handful of
group values makes every window partition data-sized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.functions import md5_hash64


def _guard_cols(df: DataFrame, op: str, *names: str) -> None:
    """Refuse inputs whose columns collide with an operator's internal
    or output names — withColumn would silently CLOBBER the caller's
    data and a later drop() would remove it from the output."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {clash} (this operator's "
            "internal/output names) — rename them first"
        )


def _id_bucket(id_col: Column | str, seed: int) -> Column:
    """Deterministic 0-999 hash bucket of the id, NULL-TOTAL: a NULL id
    hashes as the empty string instead of propagating NULL through md5
    — otherwise NULL-id rows silently vanish from every split (breaking
    hash_split's jointly-exhaustive contract) and from mixture samples
    even at weight >= 1.  Non-null ids hash exactly as before (the
    coalesce is an identity for them), so existing oracles are
    unaffected; NULL collides with the genuine empty-string id, which
    is deterministic and documented."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        md5_hash64(F.coalesce(c.cast("string"), F.lit("")), seed), F.lit(1000)
    )


def hash_split(
    df: DataFrame,
    id_col: Column | str,
    permille_lo: int,
    permille_hi: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash slice: rows whose hash bucket (0-999)
    falls in [permille_lo, permille_hi).  Disjoint ranges give disjoint,
    jointly exhaustive train/val/test splits (NULL ids included — see
    :func:`_id_bucket`)."""
    bucket = _id_bucket(id_col, seed)
    return df.where((bucket >= permille_lo) & (bucket < permille_hi))


def stratified_hash_sample(
    df: DataFrame,
    id_col: Column | str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum rates applied as
    id-hash bucket thresholds (rate ``r`` keeps buckets
    ``md5_hash64(id) % 1000 < r*1000``).  Layout-invariant and exactly
    reproducible — the same rows survive on any cluster, under any
    partitioning, and in ANSI SQL — unlike RNG-based ``sampleBy``,
    whose output depends on partition iteration order.  Strata absent
    from ``fractions`` are dropped (rate 0).  Pure narrow filter: no
    shuffle, no state, pushdown-friendly."""
    if not fractions:
        raise ValueError("fractions must name at least one stratum")
    bucket = _id_bucket(id_col, seed)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        permille = int(round(frac * 1000))
        thresh = (
            F.when(cond, permille) if thresh is None else thresh.when(cond, permille)
        )
    return df.where(bucket < thresh.otherwise(F.lit(0)))


def reservoir_per_group(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    k: int,
    seed: int = 0,
    single_task_threshold: int = 2_000_000,
    n: int | None = None,
) -> DataFrame:
    """Uniform k-row sample per group without replacement: rank rows by a
    deterministic hash of their id and keep the k smallest.  Equivalent in
    distribution to a per-group reservoir, but stable across runs.

    Size-gated like :func:`sorts.global_ranked_adaptive` (same ``n``
    contract): below the threshold, one window on the group key.  Above
    it that window is a scale bug for low-cardinality groups (every
    partition is data-sized), so the big tier takes per-INPUT-partition
    local top-k first — ``sortWithinPartitions`` (narrow, no exchange)
    + the monotonically_increasing_id local-rank construction from
    ``global_ranked``, with a (#partitions × #groups)-sized min-id
    summary broadcast back — leaving ≤ P×G×k candidate rows for the
    exact per-group window.  The full corpus never crosses an exchange
    at all: only the tiny summary and the surviving candidates move.
    Both tiers keep exactly the same rows (k smallest by (hash, id)
    per group; every global winner is a winner within its own input
    partition).  The summary join-back is NULL-SAFE on the group keys:
    ``Window.partitionBy`` treats NULL as a group, so a null-unsafe
    equi-join would silently drop every NULL-keyed row from the big
    tier only — same data, different sample, rows lost at scale (r15
    review finding)."""
    from functools import reduce

    _guard_cols(df, "reservoir_per_group", "__h", "__pid", "__mid", "__m0", "__r")
    h = md5_hash64(id_col, seed)
    if n is None:
        n = df.count()
    if n <= single_task_threshold:
        w = Window.partitionBy(*keys).orderBy(h, F.col(id_col))
        return (
            df.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= k)
            .drop("__r")
        )
    local = (
        df.withColumn("__h", h)
        .sortWithinPartitions(*keys, F.col("__h"), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    mins = local.groupBy("__pid", *keys).agg(F.min("__mid").alias("__m0"))
    mins = mins.select(
        F.col("__pid").alias("__pid2"),
        *[F.col(c).alias(f"__k_{c}") for c in keys],
        "__m0",
    )
    cond = reduce(
        lambda a, b: a & b,
        [local["__pid"] == F.col("__pid2")]
        + [local[c].eqNullSafe(F.col(f"__k_{c}")) for c in keys],
    )
    cand = (
        local.join(F.broadcast(mins), cond)
        # rows of one (partition, group) are contiguous in the local
        # sort and mids increment by one per row, so this IS the
        # 0-based local rank (the global_ranked mid contract)
        .where(F.col("__mid") - F.col("__m0") < k)
        .drop("__pid2", *[f"__k_{c}" for c in keys])
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__h"), F.col(id_col))
    return (
        cand.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r", "__h", "__pid", "__mid", "__m0")
    )


def deterministic_shuffle(df: DataFrame, id_col: Column | str, seed: int = 0) -> DataFrame:
    """Seeded global shuffle of a corpus: order rows by a deterministic
    hash of their id — the "shuffle the training data" step of a
    pretraining pipeline, reproducible bit-for-bit across runs, cluster
    layouts, and engine versions (``df.orderBy(rand(seed))`` is none of
    those: Spark's rand is partition-layout dependent).

    Emits the hash as ``shuffle_key``: downstream writers sort/range-
    partition by it (a plain distributed sort — no global row-number
    bottleneck), and the key column itself pins the permutation for the
    correctness oracle.  A different ``seed`` gives an independent
    epoch order.
    """
    _guard_cols(df, "deterministic_shuffle", "shuffle_key")
    return df.withColumn("shuffle_key", md5_hash64(id_col, seed)).orderBy(
        "shuffle_key", F.col(id_col) if isinstance(id_col, str) else id_col
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: Column | str,
    weights: dict[str, float],
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mixture sampling: keep (or replicate) each row according
    to its group's sampling weight — the source/language mixing step
    that turns a raw corpus into a training mixture.

    ``weight < 1`` downsamples (keep iff hash bucket < weight·1000);
    ``weight > 1`` upsamples: every row appears ``floor(weight)`` times
    and one extra time with probability ``frac(weight)``, each copy
    tagged with ``copy_id`` (1-based) so downstream epochs can
    distinguish replicas.  All decisions are pure functions of
    (id, seed): reproducible across runs and layouts, and expressible
    in the SQL oracle.

    Scale shape: a narrow projection + filter + explode of a tiny
    ``sequence`` array — no shuffle, no RNG state, safe at any scale;
    the skew an aggressive upsample introduces is ordinary row-count
    skew that AQE handles downstream.
    """
    w: Column = F.lit(float(default_weight))
    for value, weight in sorted(weights.items()):
        w = F.when(F.col(group_col) == value, F.lit(float(weight))).otherwise(w)
    return _replicate_by_weight(df, w, id_col, seed)


def _replicate_by_weight(
    df: DataFrame, w: Column, id_col: Column | str, seed: int
) -> DataFrame:
    """Shared keep/replicate kernel: floor(w) copies plus one extra with
    probability frac(w), decided by the row's hash bucket (NULL-total:
    a NULL id must still yield floor(w) copies, not vanish)."""
    _guard_cols(df, "mixture_sample", "__copies", "copy_id")
    bucket = _id_bucket(id_col, seed)
    base = F.floor(w).cast("bigint")
    extra = (bucket < F.round((w - F.floor(w)) * 1000, 0)).cast("bigint")
    copies = (base + extra).alias("__copies")
    return (
        df.withColumn("__copies", copies)
        .where(F.col("__copies") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__copies"))))
        .drop("__copies")
    )


def mixture_sample_by_weights(
    df: DataFrame,
    group_col: str,
    id_col: Column | str,
    weights_df: DataFrame,
    weight_col: str = "weight",
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """:func:`mixture_sample` with COMPUTED weights: ``weights_df`` is a
    tiny (group, weight) relation — typically derived from the corpus
    itself (hit a target token distribution, equalize domains, match a
    published mixture) — broadcast-joined onto the data.

    This is the at-scale shape: mixture weights come out of an
    aggregation over the same 100 TB corpus, never a hand-typed
    literal; groups missing from ``weights_df`` fall back to
    ``default_weight``.
    """
    # internal weight name: if df itself carries a column named
    # weight_col, the join would duplicate the name — the coalesce
    # becomes ambiguous (or silently reads the caller's column as the
    # sampling weight) and drop() strips the caller's data
    _guard_cols(df, "mixture_sample_by_weights", "__w")
    wdf = weights_df.select(
        F.col(group_col), F.col(weight_col).alias("__w")
    )
    w = F.coalesce(F.col("__w"), F.lit(float(default_weight)))
    joined = df.join(F.broadcast(wdf), on=group_col, how="left")
    return _replicate_by_weight(joined, w, id_col, seed).drop("__w")

"""Aggregation operators.

The reference's only aggregation is a sort-based streaming per-key MAX in
user code (``/root/reference/reducer.py:16-40``) with NO map-side combine
— every record crosses the shuffle (``Worker/worker.py:120-127``).
Spark's hash aggregate does partial (map-side) + final aggregation
automatically, so each helper here is strictly stronger than the
reference's substrate by construction.

Scale notes:
- partial agg means shuffle volume is O(groups), not O(rows);
- high-cardinality DISTINCT should use ``approx_count_distinct`` (HLL)
  — exact distinct at 100 TB is a full shuffle of the key space;
- rollup/cube expand to grouping sets on the map side, still one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """groupBy().agg() — hash agg with automatic partial/final split."""
    return df.groupBy(*keys).agg(*aggs)


def distinct_count(df: DataFrame, keys: list[str], col: str, alias: str) -> DataFrame:
    """Exact COUNT(DISTINCT col) per group (two-phase shuffle)."""
    return df.groupBy(*keys).agg(F.countDistinct(col).alias(alias))


def approx_distinct_count(df: DataFrame, keys: list[str], col: str, alias: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ COUNT(DISTINCT) — the 100 TB path: fixed-size sketch
    per group instead of shuffling every distinct value."""
    return df.groupBy(*keys).agg(F.approx_count_distinct(col, rsd).alias(alias))


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column], fill: str = "(all)") -> DataFrame:
    """GROUP BY ROLLUP with subtotal key levels COALESCEd to ``fill`` so
    results are unambiguous even when real data contains NULL keys."""
    out = df.rollup(*keys).agg(*aggs)
    for k in keys:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(fill)))
    return out


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column], fill: str = "(all)") -> DataFrame:
    """GROUP BY CUBE — all 2^k grouping sets in one pass."""
    out = df.cube(*keys).agg(*aggs)
    for k in keys:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(fill)))
    return out


def percentiles(df: DataFrame, keys: list[str], col: str, probs: list[float]) -> DataFrame:
    """Approximate percentiles (t-digest style) — mergeable sketches, the
    only sane percentile at scale."""
    aggs = [
        F.percentile_approx(col, p).alias(f"p{int(p * 100)}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def hll_sketch_count(
    df: DataFrame, keys: list[str], col: str, alias: str = "distinct_est"
) -> DataFrame:
    """One-shot Apache DataSketches HLL distinct-count *estimate* (Spark 4
    ``hll_sketch_agg`` piped straight into ``hll_sketch_estimate``).
    When the sketch itself must survive for later merging, use
    :func:`hll_sketch_partials` instead."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(col)).alias(alias)
    )


def hll_sketch_partials(df: DataFrame, keys: list[str], col: str) -> DataFrame:
    """Per-group reusable HLL sketches exposed as a *binary column*, so
    partial sketches from independent jobs (per-day, per-region) union
    losslessly via ``hll_union_agg`` (:func:`hll_merge`) —
    re-aggregation without re-scanning, the property that makes
    incremental 100 TB rollups possible."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias("sketch"))


def hll_merge(partials: DataFrame, keys: list[str], alias: str = "distinct_est") -> DataFrame:
    """Merge previously materialized sketches to a coarser grouping."""
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(alias)
    )


def histogram_fixed(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbuckets: int,
) -> DataFrame:
    """Fixed-width histogram: one row per non-empty bucket with count and
    value range.  Out-of-range values clamp into the edge buckets.

    The bucket index is plain ``floor((x - lo) / step)`` (not
    ``width_bucket``) so the exact same double expression runs in the
    SQL oracle; single shuffle with map-side partials, fully codegen'd.
    """
    step = (hi - lo) / nbuckets
    bucket = (
        F.least(
            F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(step)), F.lit(0)),
            F.lit(nbuckets - 1),
        )
        .cast("bigint")
        .alias("bucket")
    )
    return (
        df.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(col), 2).alias("lo_seen"),
            F.round(F.max(col), 2).alias("hi_seen"),
        )
        .withColumn("bucket_lo", F.round(F.col("bucket") * F.lit(step) + F.lit(lo), 2))
        .orderBy("bucket")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: one output row per column with row count,
    null count, and exact distinct count.

    Single aggregate pass over the input (all per-column counters fold in
    one job), then a ``stack`` unpivot of the 1-row result — the unpivot
    costs nothing because it runs on one row.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{c}', __n, __null_{c}, __dist_{c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_rows, n_nulls, n_distinct)"
    )


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 20,
    top: int | None = None,
    exact_recount: bool = True,
) -> DataFrame:
    """Heavy hitters via mergeable Misra-Gries summaries.

    Stage 1 (``mapInPandas``): each partition keeps at most ``k``
    counters — per Arrow batch the values are counted vectorized
    (``value_counts``), folded into the running summary, then pruned by
    subtracting the (k+1)-th largest counter (the mergeable-summaries
    prune).  Stage 2: the per-partition summaries (≤ k rows each — tiny)
    are summed per item, keeping the classic guarantee: every item with
    true frequency > n/(k+1) survives as a candidate, no matter how the
    rows were partitioned.  Stage 3 (optional): one more scan recounts
    ONLY the candidate set via a broadcast semi-join, turning lower
    bounds into exact counts — candidate pruning still isn't exact
    top-k, which is why the registered query is rows-only-checked.

    Scale shape: one linear scan + a ≤(partitions·k)-row merge + an
    optional broadcast-filtered recount.  No full-data groupBy on the
    raw column, which is the point when the column is long-tailed text.
    """
    out_top = top if top is not None else k
    cands = (
        _mg_summaries(df, col, k)
        .where(~F.col("is_total"))
        .groupBy("item")
        .agg(F.sum("weight").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("item"))
        .limit(out_top)
    )
    if not exact_recount:
        return cands
    exact = (
        df.join(F.broadcast(cands.select("item")), df[col] == F.col("item"), "inner")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("item"))
    )
    return exact


def _mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries in ONE linear scan: ≤k
    counter rows per partition plus one ``is_total`` row carrying the
    partition's row count (so callers that need n don't pay a second
    scan).  Null values are not counted, matching ``value_counts``."""
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        total = 0
        for pdf in batches:
            total += len(pdf)
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - kth for v, c in counters.items() if c > kth}
        yield pd.DataFrame(
            {
                "item": list(counters) + [None],
                "weight": list(counters.values()) + [total],
                "is_total": [False] * len(counters) + [True],
            }
        )

    field = df.schema[col]
    return df.select(col).mapInPandas(
        mg, schema=f"item {field.dataType.simpleString()}, weight long, is_total boolean"
    )


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Two-pass exact heavy hitters: items with true count > n/(k+1).

    Pass 1 is the Misra-Gries candidate sketch (:func:`_mg_summaries`),
    whose mergeable-summaries guarantee makes the ≤k candidates a
    *superset* of every item with count > n/(k+1) under any
    partitioning; the same scan's ``is_total`` rows carry n, so the
    total is free.  Pass 2 exactly recounts only the candidates
    (broadcast semi-join) and filters on ``count·(k+1) > n`` — exact
    counts, so no false positives; the superset guarantee, so no false
    negatives.  The output therefore provably equals the full-group-by
    answer in exactly two linear scans, never shuffling the long-tailed
    raw column: the shuffles move ≤(partitions·(k+1)) summary rows, and
    the threshold join broadcasts a 1-row total.

    The merged summary (≤ partitions·(k+1) rows — KB-scale) is fetched
    to the driver once and re-enters pass 2 as literals: the same
    bounded "model fetch" pattern the ANN operators use for centroids,
    and the only way to guarantee a single physical pass-1 scan (two
    broadcast subqueries over the same subtree are NOT exchange-reused
    by Spark).
    """
    summary = (
        _mg_summaries(df, col, k)
        .groupBy("item", "is_total")
        .agg(F.sum("weight").alias("weight"))
        .collect()
    )
    n = sum(r["weight"] for r in summary if r["is_total"])
    cand_rows = sorted(
        ((r["weight"], r["item"]) for r in summary if not r["is_total"]),
        key=lambda t: (-t[0], t[1]),
    )[:k]
    spark = df.sparkSession
    item_type = df.schema[col].dataType.simpleString()
    cands = spark.createDataFrame(
        [(item,) for _, item in cand_rows], schema=f"item {item_type}"
    )
    return (
        df.join(F.broadcast(cands), df[col] == F.col("item"), "inner")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") * (k + 1) > F.lit(n))
        .select("item", "count")
        .orderBy(F.col("count").desc(), F.col("item"))
    )

"""Sort / limit / top-k operators.

The reference sorts twice, both lexicographically on raw lines: the
pre-reduce partition sort (``/root/reference/Worker/worker.py:179-183``)
and the client-side global sort at READ (``Client/client.py:105-108``).
Spark equivalents are typed and distributed: ``sortWithinPartitions`` is
the exact analog of the former; ``orderBy`` does a range-partitioned
global sort (sampled bounds, no single-node merge) for the latter.

Scale note: global top-k must NOT be ``orderBy().limit()`` materialized
naively — Spark already optimizes limit-after-sort into TakeOrdered
(per-partition top-k then merge of k·P rows), which is why ``top_k`` is
expressed exactly that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def order_by(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """Global sort (range partition + local sort)."""
    return df.orderBy(*cols)


def sort_within_partitions(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """Partition-local sort, no exchange — the reference's F5."""
    return df.sortWithinPartitions(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def top_k(df: DataFrame, order_cols: list[Column | str], k: int) -> DataFrame:
    """Global top-k: Catalyst plans this as TakeOrderedAndProject —
    each partition keeps k rows, the driver merges k·P rows."""
    return df.orderBy(*order_cols).limit(k)


def global_ranked(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Exact global rank over a TOTAL order — without the
    single-partition global window (``Window.orderBy`` with no
    partitionBy moves the whole relation through ONE task; Spark warns
    ``WindowExec: No Partition Defined`` at runtime, and at 100 TB that
    task is the job).

    Two-phase range ranking, the distributed-sort construction:

    1. ``repartitionByRange`` on the order columns — ascending
       partition ids follow the requested order, so partition p holds
       exactly the rows ranked after every row of partitions < p;
    2. ``row_number`` within each range partition (parallel windows);
    3. per-partition row counts (one tiny row per partition) turn into
       cumulative offsets; ``rank = local_rank + offset[pid]``.

    The offsets relation is partition-count-sized (dozens-to-thousands
    of rows at any scale — a cluster-config bound, not a data bound),
    so its own unpartitioned window and the broadcast join are both
    O(#partitions).  Range boundaries come from sampling and may place
    ties on either side of a boundary, so ``order_cols`` must be a
    total order (include a unique tiebreaker) — which row_number
    semantics need for determinism anyway.

    ``total_col``: also attach the total row count (broadcast scalar,
    e.g. for percent_rank = (rank-1)/(n-1) or ntile bucketing).  It
    folds from the SAME per-partition counts, reusing the range
    exchange — callers must not recount the input through its own
    (possibly expensive) lineage.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sdf = df.repartitionByRange(*order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    wloc = Window.partitionBy("__pid").orderBy(*order_cols)
    local = sdf.withColumn("__lr", F.row_number().over(wloc))
    # counts come from the pre-window relation so the offsets branch
    # reuses the range exchange without re-running the rank window
    sizes = sdf.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # #partitions rows only: the unpartitioned window here is bounded
    # by cluster width, never by data volume
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "__pid", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off")
    )
    out = (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(rank_col, (F.col("__lr") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lr", "__off")
    )
    if total_col is not None:
        total = sizes.groupBy().agg(
            F.sum("__cnt").cast("bigint").alias(total_col)
        )
        out = out.crossJoin(F.broadcast(total))
    return out

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
shuffle); ``reservoir_per_group`` is one shuffle on the group key and
never materializes more than the window sort — at 100 TB prefer a
two-level variant (pre-filter by hash threshold, then rank) if k is
tiny relative to group size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.functions import md5_hash64


def hash_split(
    df: DataFrame,
    id_col: Column | str,
    permille_lo: int,
    permille_hi: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash slice: rows whose hash bucket (0-999)
    falls in [permille_lo, permille_hi).  Disjoint ranges give disjoint,
    jointly exhaustive train/val/test splits."""
    bucket = F.pmod(md5_hash64(id_col, seed), F.lit(1000))
    return df.where((bucket >= permille_lo) & (bucket < permille_hi))


def reservoir_per_group(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Uniform k-row sample per group without replacement: rank rows by a
    deterministic hash of their id and keep the k smallest.  Equivalent in
    distribution to a per-group reservoir, but stable across runs."""
    w = Window.partitionBy(*keys).orderBy(md5_hash64(id_col, seed), F.col(id_col))
    return (
        df.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )

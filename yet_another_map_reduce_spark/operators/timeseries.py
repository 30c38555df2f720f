"""Time-series operators: resampling (OHLC), gap-filling, z-score outliers.

The reference engine expresses time-bucketed aggregation as a full
map-shuffle-reduce job (``/root/reference/mapper.py`` emits the bucket key,
``/root/reference/reducer.py:16-40`` folds per key); these helpers get the
same semantics from one declarative ``groupBy`` so Catalyst applies
map-side partial aggregation and AQE sizes the single shuffle.

Scale notes (100 TB):

- ``resample_ohlc``: ``min_by``/``max_by`` partials are associative, so
  open/close fold map-side exactly like sum/count — one shuffle on
  (keys, bucket), no window sort over raw events.
- ``gapfill``: the spine is built per key from that key's own
  [min, max] bucket range (``sequence`` + ``explode``), so spine size is
  O(keys x buckets-in-range), never a global cross join.  The forward
  fill sorts the *bucketed* rows (orders of magnitude smaller than the
  input) inside the same key partitioning.
- ``zscore_outliers``: two passes over the events — a partial-agg stats
  pass and a broadcast join back — instead of a window over raw rows,
  because group cardinality (stats side) is tiny while the event side is
  not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ohlc(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    order_col: str,
    value_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Downsample to one OHLC row per (keys, time bucket).

    ``open``/``close`` are the values at the lexicographically first/last
    (ts, order_col) — ``order_col`` must make the ordering total (a unique
    id) so results are deterministic under ties.
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ordk = F.struct(F.col(ts_col), F.col(order_col))
    return df.groupBy(*keys, bucket).agg(
        F.min_by(value_col, ordk).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, ordk).alias("close"),
        F.round(F.sum(value_col), 2).alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def gapfill(
    bucketed: DataFrame,
    key: str,
    bucket_col: str,
    step: str = "interval 1 hour",
    count_col: str | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Fill missing time buckets per key with explicit rows.

    ``bucketed`` must already be one row per (key, bucket).  Missing
    buckets between each key's min and max get ``count_col`` = 0 and a
    forward-filled value for each of ``ffill_cols`` (last non-null
    earlier bucket; the first bucket always exists, so no leading nulls).
    """
    bounds = bucketed.groupBy(key).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        key,
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(bucket_col),
    )
    out = spine.join(bucketed, [key, bucket_col], "left")
    if count_col:
        out = out.withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("bigint"))
    w = (
        Window.partitionBy(key)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in ffill_cols or []:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def zscore_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    threshold: float = 2.5,
    z_alias: str = "z",
) -> DataFrame:
    """Rows whose value is > ``threshold`` sample standard deviations from
    their group mean.

    The group mean/stddev are rounded to 6 decimals before the per-row
    z-score so the result is bit-stable under double accumulation-order
    differences (oracle-parity rule; see queries.py docstring).
    """
    stats = df.groupBy(*keys).agg(
        F.round(F.avg(value_col), 6).alias("__mu"),
        F.round(F.stddev_samp(value_col), 6).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        df.join(F.broadcast(stats), keys)
        # NaN guard: Spark sorts NaN above all numbers, so a 1-row group's
        # NaN stddev would pass `> 0` (the SQL oracle's NULL would not).
        .where(~F.isnan("__sigma") & (F.col("__sigma") > 0))
        .withColumn(z_alias, F.round(z, 3))
        .where(F.abs(F.col(z_alias)) > threshold)
        .drop("__mu", "__sigma")
    )

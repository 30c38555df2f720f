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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import tracked_cache


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

    ``bucketed`` must already be one row per (key, bucket), with every
    bucket ON the ``__lo + n*step`` grid (i.e. bucketed at the same
    grain as ``step``).  Missing buckets between each key's min and max
    get ``count_col`` = 0 and a forward-filled value for each of
    ``ffill_cols`` (last non-null earlier bucket; the first bucket
    always exists, so no leading nulls).

    An OFF-grid input bucket (e.g. 30-minute buckets gap-filled with an
    hourly step) fails loudly via a per-row assert instead of silently
    vanishing: a plain spine-left-join keeps only spine rows, so
    misaligned data would be LOST, not zero-filled — the worst possible
    failure for a gap-filling operator.  The check rides the same
    (full outer) join, no extra job.
    """
    bounds = bucketed.groupBy(key).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    spine = bounds.select(
        key,
        F.explode(F.expr(f"sequence(__lo, __hi, {step})")).alias(bucket_col),
        F.lit(1).alias("__on_grid"),
    )
    out = spine.join(bucketed, [key, bucket_col], "full")
    grid_ok = F.assert_true(
        F.col("__on_grid").isNotNull(),
        F.concat_ws(
            " ",
            F.lit(f"gapfill: input bucket off the '{step}' grid:"),
            F.col(bucket_col).cast("string"),
        ),
    )
    out = out.withColumn("__g", grid_ok).where(F.col("__g").isNull()).drop(
        "__g", "__on_grid"
    )
    if count_col:
        out = out.withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("bigint"))
    from yet_another_map_reduce_spark.operators.windows import running

    for c in ffill_cols or []:
        out = running(out, [key], [bucket_col], F.last(c, ignorenulls=True), c)
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
    clash = {"__mu", "__sigma"} & set(df.columns)
    if clash:
        raise ValueError(
            f"zscore_outliers: input already has {sorted(clash)} (the "
            "operator's internal temp names) — rename them first"
        )
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


def rollup_hypertable(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-granularity time rollup (hypertable continuous-aggregate
    shape): the finest grain aggregates the raw events ONCE; every
    coarser grain re-aggregates the previous level's partials, never the
    raw table.

    The partials carried between levels are the associative pieces
    (count, sum, min, max); non-associative stats (avg here) are derived
    from them in the final projection, so every level is exactly equal
    to aggregating raw data at that grain directly (the SQL oracle
    checks this identity per grain).

    ``grains`` must run finest → coarsest and each coarser grain must be
    a refinement boundary of ``date_trunc``: any ascending run of
    (minute, hour, day, month, quarter, year), with ``week`` allowed
    ONLY as a final grain after day-or-finer.  Week boundaries are NOT
    month/quarter/year boundaries (and vice versa): re-truncating a
    week bucket to month attributes e.g. a Saturday 2026-08-01 event
    (week starts 2026-07-27) to JULY — silently wrong buckets, so the
    chain is VALIDATED and an invalid pair raises instead of
    mis-aggregating.

    Scale notes (100 TB): the raw scan happens once; level N+1 shuffles
    only level N's output (|keys| x buckets rows, orders of magnitude
    below the event count), and each groupBy gets map-side partial
    aggregation.  This is the batch shape of an incremental rollup: at
    ingest time only the finest grain is recomputed for the touched
    window, and coarser grains fold the changed partials.
    """
    if not grains:
        raise ValueError("rollup_hypertable: grains must be non-empty")
    chain = {
        "second": 0, "minute": 1, "hour": 2, "day": 3,
        "month": 4, "quarter": 5, "year": 6,
    }
    for a, b in zip(grains, grains[1:]):
        ok = (
            a in chain and b in chain and chain[a] < chain[b]
        ) or (b == "week" and a in ("second", "minute", "hour", "day"))
        if not ok:
            raise ValueError(
                f"rollup_hypertable: '{b}' after '{a}' is not a valid "
                "date_trunc refinement chain (week boundaries are not "
                "month/quarter/year boundaries and vice versa); got "
                f"grains={grains!r}"
            )
    finest = grains[0]
    level = df.groupBy(
        *keys, F.date_trunc(finest, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).alias("__sum"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )

    def publish(lvl: DataFrame, grain: str) -> DataFrame:
        return lvl.select(
            F.lit(grain).alias("grain"),
            *keys,
            "bucket",
            "n_events",
            F.round(F.col("__sum"), 2).alias("sum_value"),
            # avg from the ROUNDED sum: the raw sums differ in the last
            # ulp across engines (accumulation order), so a .5-boundary
            # quotient would round differently; the rounded sum is the
            # value both engines agree on bit-for-bit
            F.round(F.round(F.col("__sum"), 2) / F.col("n_events"), 6).alias("avg_value"),
            "min_value",
            "max_value",
        )

    out = publish(level, finest)
    for grain in grains[1:]:
        level = level.groupBy(
            *keys, F.date_trunc(grain, F.col("bucket")).alias("bucket")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__sum").alias("__sum"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(publish(level, grain))
    return out


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Per-key exponentially-weighted moving average:
    ``y_0 = x_0; y_i = alpha*x_i + (1-alpha)*y_{i-1}`` over rows ordered
    by ``order_cols`` (pass a unique tie-breaker, e.g. the event id, or
    the result depends on arrival order).

    This is the honest use case for the Arrow path: the recurrence has
    no shuffle-free closed form in Spark SQL — the algebraic rewrite
    ``y_i = alpha*(1-alpha)^i * running_sum(x_j/(1-alpha)^j)`` overflows
    double past a few hundred rows — so each key's series runs through
    ``applyInPandas`` with O(1) state per step.  The kernel applies the
    recurrence in the exact double-op order written above, so an ANSI-SQL
    recursive CTE replays it bit-for-bit (hash-verifiable).

    Missing values (NULL, and NaN — indistinguishable after the Arrow
    transfer) are SKIPPED-AND-CARRIED: the row's ``ewma`` repeats the
    previous row's value (NULL while no real value has been seen yet)
    and the recurrence state is untouched — one bad tick must not
    poison every subsequent row of the key with NaN, which is what the
    naive ``astype(float64)`` recurrence did (r15 review finding).
    NULL order keys sort FIRST, matching SQL ``ORDER BY`` ascending
    NULLS FIRST, so the replayed visit order is engine-identical.  The
    registered oracle covers the NULL-free fixture; the NULL semantics
    are pytest-pinned.

    Scale shape: one shuffle on the key; each group must fit an Arrow
    batch (time-series-per-entity, not the whole corpus — for
    million-row single keys, segment the key by epoch and stitch
    boundary state).  Returns input columns + ``ewma``.
    """
    import math

    out_fields = df.select(key_col, *order_cols, value_col).schema.fields
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += ", ewma double"
    a = float(alpha)

    def _kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(
            order_cols, kind="mergesort", ignore_index=True, na_position="first"
        )
        x = pdf[value_col].astype("float64").to_numpy()
        y = np.empty(len(x), dtype="float64")
        prev = math.nan
        for i in range(len(x)):
            xi = x[i]
            if math.isnan(xi):
                y[i] = prev  # missing tick: carry, state untouched
            elif math.isnan(prev):
                prev = xi  # y_0 = x_0 at the first REAL value
                y[i] = prev
            else:
                # keep this exact op order: the SQL oracle replays it
                prev = a * xi + (1.0 - a) * prev
                y[i] = prev
        ew = pd.array(y, dtype="Float64")
        ew[np.isnan(y)] = pd.NA  # leading-missing rows surface as NULL
        pdf["ewma"] = ew
        return pdf

    out = (
        df.select(key_col, *order_cols, value_col)
        .groupBy(key_col)
        .applyInPandas(_kernel, schema)
    )
    # round JVM-side: Spark's HALF_UP matches ANSI round() (numpy's
    # .round is half-even and would drift from the SQL twin)
    return out.withColumn("ewma", F.round("ewma", 6))


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the first time they
    completed each step STRICTLY AFTER completing the previous one
    (view → click → purchase and the like).  Returns one row per user
    who entered the funnel: ``(user, t_<step>..., stage)`` where stage
    counts completed steps; later-step columns are NULL once the chain
    breaks.

    Scale shape: the event stream is narrowed to the funnel's step
    types + 3 columns and MATERIALIZED once — each step's filtered
    min-aggregation reads that cache, not the raw table (the r6 scan
    audit measured k raw-table scans for a k-step funnel without it).
    Per step: a min-aggregation (map-side partials) chained by
    co-partitioned joins on the user key — no window over raw events,
    no per-user collect; AQE reuses the user partitioning.  Step i
    joins the PREVIOUS STEP's narrow (user, t_{i-1}) frame, not the
    accumulated result: chaining off the accumulated frame embeds
    out_{i-1} twice per step, growing the step-0 aggregate's plan
    occurrences as 2^(k-1) for a k-step funnel (r15 review finding) —
    semantically identical (the narrow frame holds exactly the users
    with a non-null t_{i-1}), linear plan.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(
            f"funnel: duplicate step names in {steps!r} would collide "
            "on their t_<step> columns"
        )
    ev = df.where(F.col(type_col).isin(list(steps))).select(
        user_col, ts_col, type_col
    ).transform(tracked_cache)
    first = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    out = first
    prev_frame = first  # narrow (user, t_prev) of the previous step
    prev = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            ev.where(F.col(type_col) == step)
            .join(prev_frame.select(user_col, prev), user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        out = out.join(nxt, user_col, "left")
        prev_frame = nxt
        prev = f"t_{step}"
    # stage = highest completed prefix: walk from the last step down
    expr = F.lit(len(steps))
    for i in range(len(steps) - 1, 0, -1):
        expr = F.when(F.col(f"t_{steps[i]}").isNull(), F.lit(i)).otherwise(expr)
    return out.withColumn("stage", expr.cast("bigint"))

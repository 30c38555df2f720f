"""Semantics tests for operators/timeseries.py and operators/upsert.py
on tiny hand-built frames (oracle parity at scale is covered by the
`merge_upsert`/`events_ohlc`/`timeseries_gapfill`/`outlier_zscore`
registry entries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators import timeseries, upsert


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def test_resample_ohlc_open_close_ordering(spark):
    # same bucket, out-of-order arrival; tie on ts broken by id
    rows = [
        ("a", 3, _ts(9, 30), 50.0),
        ("a", 1, _ts(9, 0), 10.0),
        ("a", 2, _ts(9, 0), 20.0),  # ties with id=1 on ts; id orders them
        ("a", 4, _ts(9, 59), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, id long, ts timestamp, v double")
    out = timeseries.resample_ohlc(df, ["k"], "ts", "id", "v", unit="hour").collect()
    assert len(out) == 1
    r = out[0]
    assert r["open"] == 10.0  # id=1 wins the ts tie
    assert r["close"] == 5.0
    assert r["high"] == 50.0 and r["low"] == 5.0
    assert r["n_ticks"] == 4


def test_gapfill_inserts_zero_rows_and_ffills(spark):
    rows = [("u", _ts(9), 2, 1.5), ("u", _ts(12), 4, 9.0)]
    df = spark.createDataFrame(rows, "k string, hr timestamp, n long, avg double")
    out = timeseries.gapfill(
        df, "k", "hr", "interval 1 hour", count_col="n", ffill_cols=["avg"]
    )
    got = {r["hr"].hour: (r["n"], r["avg"]) for r in out.collect()}
    assert got == {9: (2, 1.5), 10: (0, 1.5), 11: (0, 1.5), 12: (4, 9.0)}


def test_zscore_outliers_flags_only_extremes(spark):
    vals = [10.0] * 20 + [1000.0]
    rows = [(i, "t", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    out = timeseries.zscore_outliers(df, ["k"], "v", threshold=2.5, z_alias="z")
    got = out.collect()
    assert [r["id"] for r in got] == [20]
    assert got[0]["z"] > 2.5


def test_zscore_single_row_group_is_dropped_not_nan(spark):
    df = spark.createDataFrame([(1, "solo", 5.0)], "id long, k string, v double")
    assert timeseries.zscore_outliers(df, ["k"], "v").count() == 0


def test_upsert_update_insert_passthrough(spark):
    base = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(1, "new", 11.0), (3, "ins", 30.0)], "k long, s string, v double"
    )
    out = upsert.upsert(base, updates, ["k"], flag_col="updated", broadcast_updates=True)
    got = {r["k"]: (r["s"], r["v"], r["updated"]) for r in out.collect()}
    assert got == {
        1: ("new", 11.0, True),
        2: ("keep", 20.0, False),
        3: ("ins", 30.0, True),
    }


def test_upsert_null_update_value_does_not_clobber_flag(spark):
    # an update row carrying a NULL attribute still counts as an update
    base = spark.createDataFrame([(1, "old")], "k long, s string")
    updates = spark.createDataFrame([(1, None)], "k long, s string")
    out = upsert.upsert(base, updates, ["k"], flag_col="updated").collect()
    assert out[0]["updated"] is True
    # NULL from updates falls back to base's value (coalesce semantics)
    assert out[0]["s"] == "old"


def test_histogram_fixed_clamps_edges(spark):
    from yet_another_map_reduce_spark.operators import aggregates

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (15.0,), (99.0,), (250.0,)], "x double"
    )
    out = aggregates.histogram_fixed(df, "x", 0.0, 100.0, 10)
    got = {r["bucket"]: r["n"] for r in out.collect()}
    # -5 clamps into bucket 0; 99 → bucket 9; 250 clamps into bucket 9
    assert got == {0: 2, 1: 1, 9: 2}


def test_rollup_hypertable_levels_match_direct_aggregation(spark):
    # events spanning two days / two ISO weeks; the week level must fold
    # day partials, not re-truncate raw timestamps differently
    rows = [
        ("a", dt.datetime(2024, 1, 5, 9, 10), 1.0),   # Fri, week of Jan 1
        ("a", dt.datetime(2024, 1, 5, 9, 40), 3.0),   # same hour
        ("a", dt.datetime(2024, 1, 5, 23, 0), 10.0),  # same day, other hour
        ("a", dt.datetime(2024, 1, 8, 0, 0), 100.0),  # Mon, next ISO week
        ("b", dt.datetime(2024, 1, 5, 9, 15), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = timeseries.rollup_hypertable(df, ["k"], "ts", "v", grains=("hour", "day", "week"))
    got = {(r["grain"], r["k"], r["bucket"]): r for r in out.collect()}

    hr = got[("hour", "a", dt.datetime(2024, 1, 5, 9))]
    assert hr["n_events"] == 2 and hr["sum_value"] == 4.0 and hr["avg_value"] == 2.0
    day = got[("day", "a", dt.datetime(2024, 1, 5))]
    assert day["n_events"] == 3 and day["sum_value"] == 14.0
    assert day["min_value"] == 1.0 and day["max_value"] == 10.0
    wk1 = got[("week", "a", dt.datetime(2024, 1, 1))]
    assert wk1["n_events"] == 3 and wk1["sum_value"] == 14.0
    wk2 = got[("week", "a", dt.datetime(2024, 1, 8))]
    assert wk2["n_events"] == 1 and wk2["sum_value"] == 100.0
    # per-key isolation
    assert got[("hour", "b", dt.datetime(2024, 1, 5, 9))]["n_events"] == 1
    # 3 hour buckets + 2 day + 2 week for a, 1+1+1 for b
    assert len(got) == 10


def test_rollup_hypertable_reuses_finer_grain_stage(spark):
    # the coarser grain must fold the finer grain's shuffle output, not
    # recompute it: AQE's runtime stage reuse surfaces as ReusedExchange
    # in the FINALIZED adaptive plan (pre-execution plans show duplicate
    # exchanges — reuse is decided at stage materialization)
    rows = [
        ("a", dt.datetime(2024, 1, 5, 9, 10), 1.0),
        ("a", dt.datetime(2024, 1, 5, 11, 10), 2.0),
        ("b", dt.datetime(2024, 1, 6, 9, 10), 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = timeseries.rollup_hypertable(df, ["k"], "ts", "v", grains=("hour", "day"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_ewma_recurrence_hand_computed(spark):
    from yet_another_map_reduce_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 0.0), (1, 3, 10.0), (2, 1, 5.0)],
        "k long, seq long, value double",
    )
    out = {(r["k"], r["seq"]): r["ewma"] for r in ewma(
        df, "k", ["seq"], "value", alpha=0.5).collect()}
    # y1=10; y2=.5*0+.5*10=5; y3=.5*10+.5*5=7.5; key 2 seeds fresh
    assert out == {(1, 1): 10.0, (1, 2): 5.0, (1, 3): 7.5, (2, 1): 5.0}


def test_ewma_is_arrival_order_invariant(spark):
    from yet_another_map_reduce_spark.operators.timeseries import ewma

    rows = [(1, i, float(i % 7)) for i in range(50)]
    df1 = spark.createDataFrame(rows, "k long, seq long, value double")
    df2 = spark.createDataFrame(rows[::-1], "k long, seq long, value double").repartition(8)
    a = sorted(ewma(df1, "k", ["seq"], "value", 0.3).collect())
    b = sorted(ewma(df2, "k", ["seq"], "value", 0.3).collect())
    assert a == b


def test_funnel_requires_strictly_later_steps(spark):
    from yet_another_map_reduce_spark.operators.timeseries import funnel

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase BEFORE click -> chain breaks at stage 2
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 02:00:00", "click"),
        (2, "2024-01-01 01:00:00", "purchase"),
        # user 3: never viewed -> not in the funnel at all
        (3, "2024-01-01 00:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {r["user_id"]: r for r in funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2}
    assert out[1]["stage"] == 3
    assert out[2]["stage"] == 2 and out[2]["t_purchase"] is None


def test_gapfill_rejects_off_grid_buckets(spark):
    """An input bucket not on the __lo + n*step grid fails loudly
    instead of silently vanishing from the output (r15 review finding:
    the spine left join kept only spine rows, so misaligned data was
    LOST, not zero-filled)."""
    import pytest

    from yet_another_map_reduce_spark.operators import timeseries

    rows = [
        ("k", "2026-01-01 09:00:00", 1),
        ("k", "2026-01-01 09:30:00", 2),  # off the hourly grid
        ("k", "2026-01-01 11:00:00", 3),
    ]
    df = spark.createDataFrame(rows, "key string, bucket string, n int").select(
        "key", F.col("bucket").cast("timestamp").alias("bucket"), "n"
    )
    with pytest.raises(Exception, match="off the 'interval 1 hour' grid"):
        timeseries.gapfill(df, "key", "bucket", count_col="n").collect()
    ok = timeseries.gapfill(
        df.where("n != 2"), "key", "bucket", count_col="n"
    ).collect()
    assert {(r["bucket"].hour, r["n"]) for r in ok} == {(9, 1), (10, 0), (11, 3)}


def test_rollup_hypertable_rejects_week_month_chain(spark):
    """week is not a refinement boundary of month: the chain validator
    raises instead of silently mis-bucketing (a Saturday 2026-08-01
    event would land in July via week 2026-07-27)."""
    import pytest

    from yet_another_map_reduce_spark.operators import timeseries

    df = spark.createDataFrame(
        [(1, "2026-08-01 12:00:00", 1.0)], "id int, ts string, v double"
    ).select("id", F.col("ts").cast("timestamp").alias("ts"), "v")
    with pytest.raises(ValueError, match="week"):
        timeseries.rollup_hypertable(df, ["id"], "ts", "v", grains=("day", "week", "month"))
    with pytest.raises(ValueError, match="refinement"):
        timeseries.rollup_hypertable(df, ["id"], "ts", "v", grains=("week", "year"))
    # the valid chains still work, week-terminal included
    for grains in (("hour", "day", "week"), ("day", "month", "quarter", "year")):
        got = timeseries.rollup_hypertable(df, ["id"], "ts", "v", grains=grains)
        assert got.count() == len(grains)


def test_ewma_skips_and_carries_missing_values(spark):
    """One NULL tick must not poison the rest of the key with NaN: the
    row carries the previous ewma (NULL while nothing real seen yet)
    and the recurrence state is untouched."""
    from yet_another_map_reduce_spark.operators import timeseries

    rows = [
        ("k", 1, None),
        ("k", 2, 4.0),
        ("k", 3, None),
        ("k", 4, 8.0),
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        r["i"]: r["ewma"]
        for r in timeseries.ewma(df, "k", ["i"], "v", alpha=0.5).collect()
    }
    assert got[1] is None          # nothing real seen yet
    assert got[2] == 4.0           # y0 = first real value
    assert got[3] == 4.0           # missing: carried, state untouched
    assert got[4] == 0.5 * 8.0 + 0.5 * 4.0


def test_funnel_validates_steps(spark):
    import pytest

    from yet_another_map_reduce_spark.operators import timeseries

    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "view")], "u int, ts string, t string"
    ).select("u", F.col("ts").cast("timestamp").alias("ts"), "t")
    with pytest.raises(ValueError, match="non-empty"):
        timeseries.funnel(df, "u", "ts", "t", [])
    with pytest.raises(ValueError, match="duplicate"):
        timeseries.funnel(df, "u", "ts", "t", ["view", "click", "view"])


def test_funnel_plan_stays_linear_in_steps(spark):
    """Step i chains off the previous step's narrow frame: the step-0
    aggregate must appear a bounded number of times in the final plan,
    not 2^(k-1) (r15 review finding).  Probe: an 8-step funnel must
    still analyze in bounded time and produce the right stages."""
    from yet_another_map_reduce_spark.operators import timeseries

    steps = [f"s{i}" for i in range(8)]
    rows = [(1, f"2026-01-01 0{i}:00:00", f"s{i}") for i in range(8)]
    rows += [(2, "2026-01-01 00:00:00", "s0")]
    df = spark.createDataFrame(rows, "u int, ts string, t string").select(
        "u", F.col("ts").cast("timestamp").alias("ts"), "t"
    )
    out = timeseries.funnel(df, "u", "ts", "t", steps)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # nxt_i textually embeds nxt_{i-1}, so the cached event relation
    # appears O(k^2) times (k(k+1)/2 + k = 44 for k=8) — each occurrence
    # is an InMemoryRelation SCAN, reused at execution.  The old
    # out-chained form embedded the step-0 aggregate 2^(k-1) = 128+
    # times and blew up plan canonicalization.
    k = len(steps)
    assert plan.count("InMemoryRelation") <= k * (k + 1) // 2 + k
    got = {r["u"]: r["stage"] for r in out.collect()}
    assert got == {1: 8, 2: 1}


def test_top_k_per_group_rejects_rn_collision(spark):
    import pytest

    from yet_another_map_reduce_spark.operators import windows

    df = spark.createDataFrame([(1, 1, 5)], "k int, __rn int, v int")
    with pytest.raises(ValueError, match="__rn"):
        windows.top_k_per_group(df, ["k"], [F.col("v")], 1)


def test_zscore_rejects_temp_column_collision(spark):
    import pytest

    from yet_another_map_reduce_spark.operators import timeseries

    df = spark.createDataFrame([(1, 1.0, 2.0)], "k int, v double, __mu double")
    with pytest.raises(ValueError, match="__mu"):
        timeseries.zscore_outliers(df, ["k"], "v")

"""Salted rewrites must be result-identical to their plain forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators import skew
from yet_another_map_reduce_spark.sources.readers import read_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    salted = skew.salted_group_agg(
        li,
        keys=["l_returnflag"],
        aggs=[("l_quantity", "sum", "s"), ("l_orderkey", "count", "n")],
        salt_col="l_orderkey",
        salt=16,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s"), F.count("l_orderkey").alias("n")
    )
    got = {r["l_returnflag"]: (round(r["s"], 6), r["n"]) for r in salted.collect()}
    want = {r["l_returnflag"]: (round(r["s"], 6), r["n"]) for r in plain.collect()}
    assert got == want


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="not algebraic"):
        skew.salted_group_agg(li, ["l_returnflag"], [("l_quantity", "avg", "a")], "l_orderkey")


def test_salted_join_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    salted = skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt_col="l_linenumber", salt=4)
    plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    assert salted.count() == plain.count()
    s_sum = salted.agg(F.sum("l_quantity")).collect()[0][0]
    p_sum = plain.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(s_sum - p_sum) < 1e-6


def test_salting_rejects_noop_and_small_preserving_joins(spark, sf_dir):
    """salt_col == join key (or a grouping key) is a silent no-op —
    every row of a hot key gets the same salt; right/full outer would
    duplicate the exploded small side.  Both now raise."""
    import pytest

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    with pytest.raises(ValueError, match="no-op"):
        skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt_col="l_orderkey")
    with pytest.raises(ValueError, match="unsupported"):
        skew.salted_join(
            li, o, "l_orderkey", "o_orderkey", salt_col="l_linenumber", how="full"
        )
    with pytest.raises(ValueError, match="no-op"):
        skew.salted_group_agg(
            li, ["l_returnflag"], [("l_quantity", "sum", "s")], "l_returnflag"
        )


def test_skew_stats_orders_by_weight(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    rows = skew.skew_stats(li, "l_returnflag", top=3).collect()
    assert len(rows) == 3
    assert rows[0]["n_rows"] >= rows[1]["n_rows"] >= rows[2]["n_rows"]
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01  # 3 keys cover all


def test_asof_join_struct_carry_and_null_time(spark):
    """asof_join carries the WHOLE matched right row (one struct), so a
    NULL in one value column can no longer mix fields from different
    right rows; NULL right_time rows never match; equal-(key,time)
    duplicates resolve deterministically (greatest value row)."""
    from yet_another_map_reduce_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 2), ("q", 5)], "sym string, t long")
    right = spark.createDataFrame(
        [
            ("k", 0, 1, 2),
            ("k", 1, 5, None),     # the true as-of match for t=2
            ("q", None, 9, 9),     # NULL time: never a match
        ],
        "sym string, t long, a long, b long",
    )
    rows = {
        r["sym"]: (r["a"], r["b"])
        for r in asof_join(left, right, "sym", "t", "t", ["a", "b"]).collect()
    }
    assert rows["k"] == (5, None)   # NOT the composite (5, 2)
    assert rows["q"] == (None, None)  # NULL-time row not carried
    # deterministic duplicate resolution at equal (key, time)
    dup = spark.createDataFrame(
        [("k", 1, 7, 7), ("k", 1, 8, 8)], "sym string, t long, a long, b long"
    )
    got = asof_join(left, dup, "sym", "t", "t", ["a", "b"]).collect()
    by = {r["sym"]: (r["a"], r["b"]) for r in got}
    assert by["k"] == (8, 8)  # greatest value struct wins, every run

    import pytest
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "sym", "t", "t", ["t"])


def test_range_and_interval_joins_tolerate_shared_names(spark):
    """Same-schema sides (the normal interval case) must not hit
    AMBIGUOUS_REFERENCE in the residual predicates."""
    from yet_another_map_reduce_spark.operators.joins import (
        interval_overlap_join,
        range_join,
    )

    a = spark.createDataFrame([(1.0, 3.0)], "lo double, hi double")
    b = spark.createDataFrame([(2.0, 5.0), (10.0, 11.0)], "lo double, hi double")
    out = interval_overlap_join(a, b, "lo", "hi", "lo", "hi", bucket_width=2.0)
    assert out.count() == 1  # [1,3] overlaps [2,5] only
    pts = spark.createDataFrame([(2.5,), (9.0,)], "lo double")
    got = range_join(pts, b, "lo", "lo", "hi", bucket_width=2.0)
    assert got.count() == 1  # 2.5 in [2,5]; 9.0 in neither


def test_perceptron_margin_rejects_wrong_weight_length(spark):
    import pytest

    from yet_another_map_reduce_spark.operators import classify

    df = spark.createDataFrame([(1, 2, 3)], "id long, f1 long, f2 long")
    with pytest.raises(ValueError, match="weights"):
        classify.perceptron_score(df, [1, 2], ["f1", "f2"], "id")  # bias missing
    ok = classify.perceptron_score(df, [1, 2, 3], ["f1", "f2"], "id").collect()
    assert ok[0]["margin"] == 1 + 2 * 2 + 3 * 3

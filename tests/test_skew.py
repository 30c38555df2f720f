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
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    salted = skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt_col="l_orderkey", salt=4)
    plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    assert salted.count() == plain.count()
    s_sum = salted.agg(F.sum("l_quantity")).collect()[0][0]
    p_sum = plain.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(s_sum - p_sum) < 1e-6


def test_skew_stats_orders_by_weight(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    rows = skew.skew_stats(li, "l_returnflag", top=3).collect()
    assert len(rows) == 3
    assert rows[0]["n_rows"] >= rows[1]["n_rows"] >= rows[2]["n_rows"]
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01  # 3 keys cover all

"""Semantics tests for operators/graph.pagerank and the cogrouped-map
UDF (oracle parity covered by `graph_pagerank` / `udf_cogrouped`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators import graph, udxf


def test_pagerank_star_center_dominates(spark):
    # star: 1..4 all point at 0; 0 points back at 1
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, iterations=5).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0] == max(got.values())
    # leaves 2,3,4 have no inbound → floor rank (1 - damping)
    assert got[2] == got[3] == got[4] == 0.15


def test_pagerank_symmetric_pair_is_symmetric(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(edges, iterations=4).collect()}
    assert got[1] == got[2] == 1.0  # closed 2-cycle conserves rank


def test_cogrouped_order_fill_left_semantics(spark):
    orders = spark.createDataFrame(
        [(1, 100.0), (2, 50.0)], "o_orderkey long, o_totalprice double"
    )
    li = spark.createDataFrame(
        [(1, 10.00, 0.10), (1, 20.00, 0.00), (3, 99.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    got = {r["o_orderkey"]: r for r in udxf.cogrouped_order_fill(orders, li).collect()}
    # order 1: 10*0.9 + 20*1.0 = 29.00 → 290000 in 1e-4 fixed point
    assert got[1]["net_fp"] == 290000 and got[1]["n_items"] == 2
    # order 2 has no items; order 3's items have no order row → dropped
    assert got[2]["net_fp"] == 0 and got[2]["n_items"] == 0
    assert set(got) == {1, 2}

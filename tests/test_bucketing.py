"""Bucketed co-located joins must plan without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from yet_another_map_reduce_spark import plans
from yet_another_map_reduce_spark.sources import bucketing
from yet_another_map_reduce_spark.sources.readers import read_table


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    bucketing.write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"])
    bucketing.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )

    # force the SMJ path: broadcast would trivially avoid the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cobucketed_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        agg = joined.agg(F.sum("l_quantity").alias("s"))
        n_exchanges_join = plans.count_exchanges(joined)
        assert n_exchanges_join == 0, plans.formatted_plan(joined)
        # and the result is correct
        plain = (
            read_table(spark, sf_dir, "orders")
            .join(
                read_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .agg(F.sum("l_quantity").alias("s"))
        )
        assert abs(agg.collect()[0]["s"] - plain.collect()[0]["s"]) < 1e-6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")

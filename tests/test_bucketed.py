"""Bucketed co-located join: the write-once-shuffle-never strategy
must plan a sort-merge join with ZERO Exchange operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataflink_spark.sources.bucketed import colocated_join, write_bucketed
from bigdataflink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", buckets=8)
    write_bucketed(cust, "b_customer", "o_custkey", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, bucketed_tables):
    joined = colocated_join(spark, "b_orders", "b_customer", "o_custkey")
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey", "inner")
    assert joined.count() == plain.count()
    a = joined.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    b = plain.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

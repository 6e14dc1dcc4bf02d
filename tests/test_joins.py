"""Unit tests for the custom join operators (operators/joins.py):
as-of join semantics on a hand-built fixture, bucketed range join
residual correctness, and salted-join ≡ plain-join equivalence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdataflink_spark.operators import joins
from bigdataflink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_asof_join_fixture(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (1, _ts(5)), (2, _ts(10)), (3, _ts(10))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 10.0), (1, _ts(15), 15.0), (2, _ts(11), 99.0)],
        "k int, rts timestamp, v double",
    )
    out = joins.asof_join(left, right, ["k"], "ts", "rts", ["v"])
    got = {(r.k, r.ts.minute): r.v for r in out.collect()}
    assert got == {
        (1, 10): 10.0,  # inclusive: rts == ts matches
        (1, 20): 15.0,  # latest prior wins
        (1, 5): None,  # nothing at-or-before
        (2, 10): None,  # right row is strictly later
        (3, 10): None,  # key absent on right
    }
    assert out.count() == left.count()


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([(1, _ts(1), 2.0)], "k int, ts timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        joins.asof_join(df, df, ["k"], "ts", "ts", ["v"])


def test_bucketed_range_join_matches_theta_join(spark):
    ev = load_table(spark, "events", SF)
    tiers = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 500.0)],
        "tier string, lo double, hi double",
    )
    fast = joins.bucketed_range_join(ev, tiers, "value", bucket_width=50.0)
    slow = ev.join(
        tiers, (ev.value >= tiers.lo) & (ev.value < tiers.hi), "inner"
    )
    assert fast.count() == ev.count()  # tiers cover the whole domain
    f = {(r.event_id, r.tier) for r in fast.select("event_id", "tier").collect()}
    s = {(r.event_id, r.tier) for r in slow.select("event_id", "tier").collect()}
    assert f == s


def test_bucketed_range_join_interval_spanning_buckets(spark):
    probe = spark.createDataFrame([(i, float(i)) for i in range(200)], "id int, v double")
    iv = spark.createDataFrame([("wide", 3.0, 177.0)], "tier string, lo double, hi double")
    out = joins.bucketed_range_join(probe, iv, "v", bucket_width=10.0)
    assert out.count() == 174  # 3..176 inclusive


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = joins.salted_join(orders, cust, "o_custkey", salt=8)
    plain = orders.join(cust, "o_custkey", "inner")
    assert salted.count() == plain.count()
    cols = sorted(set(plain.columns))
    a = sorted(map(tuple, salted.select(*cols).collect()))
    b = sorted(map(tuple, plain.select(*cols).collect()))
    assert a == b


def test_salted_join_rejects_right_outer(spark):
    """The build side is replicated `salt` times, so right/full outer
    would emit unmatched right rows once per replica — rejected."""
    import pytest

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            joins.salted_join(orders, cust, "o_custkey", salt=4, how=how)


def test_salted_left_join_equals_plain_left_join(spark):
    cust = load_table(spark, "customer", SF).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    orders = load_table(spark, "orders", SF)
    salted = joins.salted_join(orders, cust, "o_custkey", salt=4, how="left")
    plain = orders.join(cust, "o_custkey", "left")
    cols = sorted(set(plain.columns))
    a = sorted(map(tuple, salted.select(*cols).collect()))
    b = sorted(map(tuple, plain.select(*cols).collect()))
    assert a == b
